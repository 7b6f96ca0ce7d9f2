"""Cache the WikipediaTokenizer scanner parity oracle to tests/data/.

Deterministic wiki-markup fuzz corpus tokenized by the reference's
compiled scanner (WikipediaTokenizerImpl via tools/ref_tokenizer.py),
records (type, start, len, text, posInc) per token.

Usage: python tools/gen_wikipedia_oracle.py
"""

from __future__ import annotations

import gzip
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.ref_tokenizer import tokenize_many  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "wikipedia_oracle.json.gz")

PIECES = ["[[", "]]", "[", "]", "''", "'''", "'''''", "==", "===", "{{",
          "}}", "<ref>", "</ref>", "Category:", ":Category:", "|", "link",
          "here", "again", "foo", "3.25", "U.S.A.", "AT&T", "a@b.com",
          "http://x.yz/a?b=c", "https://lucene.apache.org", " ", "  ",
          "\n", "\t", "日本語", "한국어", "O'Reilly", "{{Infobox_x", "<sup>",
          "</sup>", "=", "'", ".", ",", "-", "_", "/", "text", "Test",
          "display info", "h   i   j", "e f g"]


def main():
    rng = random.Random(1133)
    texts = []
    for _ in range(3000):
        n = rng.randint(1, 25)
        texts.append("".join(rng.choice(PIECES) for _ in range(n)))
    alpha = list("ab1.'=[]{}|<>/&@:_- \n")
    for _ in range(2000):
        n = rng.randint(1, 30)
        texts.append("".join(rng.choice(alpha) for _ in range(n)))
    oracle = tokenize_many(texts, which="wikipedia", maxlen=2**31 - 1)
    recs = [{"text": t, "tokens": toks} for t, toks in zip(texts, oracle)]
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(recs, f, ensure_ascii=False)
    ntok = sum(len(r["tokens"]) for r in recs)
    print(f"wrote {OUT}: {len(recs)} texts, {ntok} oracle tokens")


if __name__ == "__main__":
    main()
