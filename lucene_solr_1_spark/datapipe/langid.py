"""Character-n-gram language identification (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization"): rank-order statistics of the
text's most frequent trigrams against per-language profiles.

The 15 profiles (en de fr es it pt nl sv da no fi hu ro ru tr, 300
trigrams each) are DATA derived from the public Snowball vocabularies
shipped in the reference's TestSnowballVocabData.zip — one more use of
the same corpus that validates the stemmers. This replaces the
stopword-profile heuristic of quality.py's `lang_id` as the quality
path (the heuristic stays as the SQL-twin contract entry).

Scale: classification is an Arrow-batched pandas stage over mapInPandas
(profile tables broadcast in the closure, ~72 KB); per-document cost is
O(len(text)) trigram extraction + a rank join against 300-entry dicts.
"""

from __future__ import annotations

import collections
import gzip
import json
import os

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_PROFILES: dict[str, dict[str, int]] | None = None
MAX_OUT_OF_PLACE = 300


def _profiles() -> dict[str, dict[str, int]]:
    global _PROFILES
    if _PROFILES is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "langid_trigrams.json.gz")
        with gzip.open(path, "rt") as f:
            raw = json.load(f)
        _PROFILES = {lang: {g: i for i, g in enumerate(grams)}
                     for lang, grams in raw.items()}
    return _PROFILES


def detect_language(text: str, top_n: int = 300) -> tuple[str, float]:
    """(language, confidence) for one text. Distance = sum of
    out-of-place ranks (capped) between the text's top trigrams and
    each profile; confidence = relative margin of the best language
    over the runner-up."""
    counts: collections.Counter = collections.Counter()
    s = " " + " ".join(text.lower().split()) + " "
    for i in range(len(s) - 2):
        g = s[i:i + 3]
        if not g.isspace():
            counts[g] += 1
    grams = [g for g, _ in counts.most_common(top_n)]
    if not grams:
        return "und", 0.0
    scores = {}
    for lang, prof in _profiles().items():
        d = 0
        for rank, g in enumerate(grams):
            p = prof.get(g)
            d += abs(p - rank) if p is not None else MAX_OUT_OF_PLACE
        scores[lang] = d / len(grams)
    ordered = sorted(scores.items(), key=lambda kv: kv[1])
    best, second = ordered[0], ordered[1]
    conf = (second[1] - best[1]) / max(second[1], 1e-9)
    return best[0], round(float(conf), 4)


LANGID_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("confidence", T.FloatType()),
])


def detect_languages(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """DataFrame(doc_id, lang, confidence), Arrow-batched."""

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                lang, conf = detect_language(str(getattr(r, text_col)))
                out.append((getattr(r, id_col), lang, conf))
            yield pd.DataFrame(out, columns=["doc_id", "lang",
                                             "confidence"])

    return (df.select(F.col(id_col).alias(id_col),
                      F.col(text_col).alias(text_col))
            .mapInPandas(run, schema=LANGID_SCHEMA))
