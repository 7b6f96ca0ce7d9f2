#!/usr/bin/env python3
"""Extract UAX#29 Sentence_Break property classes from the public
`regex` package's bundled Unicode character database into
analysis/data/sb_ranges.json.gz (same data boundary as
tools/gen_uscript.py).  Backs analysis/sentence.py."""

import gzip
import json
import os

import regex

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "lucene_solr_1_spark", "analysis", "data",
                   "sb_ranges.json.gz")

CLASSES = ["CR", "LF", "Extend", "Sep", "Format", "Sp", "Lower", "Upper",
           "OLetter", "Numeric", "ATerm", "SContinue", "STerm", "Close"]

MAX_CP = 0x10FFFF


def ranges_of(cls: str) -> list:
    pat = regex.compile(r"\p{SentenceBreak=%s}" % cls)
    out, lo = [], None
    for cp in range(MAX_CP + 1):
        if pat.match(chr(cp)):
            if lo is None:
                lo = cp
        elif lo is not None:
            out.append([lo, cp - 1])
            lo = None
    if lo is not None:
        out.append([lo, MAX_CP])
    return out


def main() -> None:
    data = {c: ranges_of(c) for c in CLASSES}
    with gzip.open(OUT, "wt", encoding="ascii", compresslevel=9) as f:
        json.dump(data, f)
    print(f"wrote {OUT}:",
          {c: sum(hi - lo + 1 for lo, hi in r) for c, r in data.items()})


if __name__ == "__main__":
    main()
