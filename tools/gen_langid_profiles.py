"""Regenerate datapipe/data/langid_trigrams.json.gz from the public
Snowball vocabularies in the reference's TestSnowballVocabData.zip
(train = all but every 10th word; the held-out tenth feeds the
accuracy test in tests/test_datapipe.py)."""

from __future__ import annotations

import collections
import gzip
import json
import os
import zipfile

ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
       "lucene/analysis/snowball/TestSnowballVocabData.zip")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "lucene_solr_1_spark", "datapipe",
    "data", "langid_trigrams.json.gz")
LANGS = {"english": "en", "german": "de", "french": "fr",
         "spanish": "es", "italian": "it", "portuguese": "pt",
         "dutch": "nl", "swedish": "sv", "danish": "da",
         "norwegian": "no", "finnish": "fi", "hungarian": "hu",
         "romanian": "ro", "russian": "ru", "turkish": "tr"}
TOP_N = 300


def main() -> None:
    z = zipfile.ZipFile(ZIP)
    profiles = {}
    for zl, code in LANGS.items():
        words = z.read(f"{zl}/voc.txt").decode("utf-8").split()
        train = [w for i, w in enumerate(words) if i % 10 != 0]
        counts: collections.Counter = collections.Counter()
        for w in train:
            s = f" {w.lower()} "
            for i in range(len(s) - 2):
                counts[s[i:i + 3]] += 1
        profiles[code] = [g for g, _ in counts.most_common(TOP_N)]
    with gzip.open(OUT, "wt") as f:
        json.dump(profiles, f)
    print(f"wrote {OUT}: {len(profiles)} languages x {TOP_N} trigrams")


if __name__ == "__main__":
    main()
