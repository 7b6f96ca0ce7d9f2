"""Cache the UAX29URLEmail parity oracle to tests/data/.

Corpus = the reference's own URL/email test corpora
(random.text.with.urls.txt, random.text.with.email.addresses.txt,
LuceneResourcesWikiPage.html — reference TEST DATA, cached the same
way the Snowball vocabulary zips are) in 20-line chunks, plus the
word-break stress corpus. Expected token streams come from the
compiled reference DFA (UAX29URLEmailTokenizerImpl via
tools/ref_tokenizer.py).

Usage: python tools/gen_urlemail_oracle.py
"""

from __future__ import annotations

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.ref_tokenizer import tokenize_many  # noqa: E402

BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
        "analysis/core/")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "tests", "data", "urlemail_oracle.json.gz")
WB = os.path.join(HERE, "tests", "data", "wb_oracle_standard.json.gz")


def main():
    texts = []
    for f in ("random.text.with.urls.txt",
              "random.text.with.email.addresses.txt",
              "LuceneResourcesWikiPage.html"):
        lines = open(BASE + f, encoding="utf-8").read().splitlines()
        for i in range(0, len(lines), 20):
            texts.append("\n".join(lines[i:i + 20]))
    with gzip.open(WB, "rt", encoding="utf-8") as fh:
        texts += [r["text"] for r in json.load(fh)]
    oracle = tokenize_many(texts, which="urlemail", maxlen=255)
    recs = [{"text": t, "tokens": toks} for t, toks in zip(texts, oracle)]
    with gzip.open(OUT, "wt", encoding="utf-8") as fh:
        json.dump(recs, fh, ensure_ascii=False)
    ntok = sum(len(r["tokens"]) for r in recs)
    print(f"wrote {OUT}: {len(recs)} texts, {ntok} oracle tokens")


if __name__ == "__main__":
    main()
