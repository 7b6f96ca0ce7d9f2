#!/usr/bin/env python3
"""Package the ICU break-rule SOURCE files shipped with the reference
into analysis/data/rbbi_rules.json.gz.

These are Apache-licensed rule DATA files (grammar text consumed by a
break-rule compiler, not program code), same boundary as the Snowball
among-vectors / IPADIC binaries / Thai break tables already vendored
by the other tools/gen_*.py generators:

  lucene/analysis/icu/src/data/uax29/{Default,Hebrew,Khmer,Lao,Myanmar}.rbbi
  lucene/analysis/icu/src/test/.../segmentation/*.rbbi   (test tailorings)

Run from the repo root with the reference checkout present:
  python tools/gen_rbbi_rules.py /root/reference
"""

import gzip
import json
import os
import sys

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "lucene_solr_1_spark", "analysis", "data",
                   "rbbi_rules.json.gz")

DATA = "lucene/analysis/icu/src/data/uax29"
TEST = ("lucene/analysis/icu/src/test/org/apache/lucene/analysis/icu/"
        "segmentation")


def strip_license(text: str) -> str:
    """Drop leading comment-only license banner lines (keep rule text
    and the inline comments that document the grammar)."""
    lines = text.splitlines()
    i = 0
    while i < len(lines) and (not lines[i].strip()
                              or lines[i].lstrip().startswith("#")):
        i += 1
    return "\n".join(lines[i:]) + "\n"


def main(ref_root: str) -> None:
    rules = {}
    for name in ("Default", "Hebrew", "Khmer", "Lao", "Myanmar"):
        path = os.path.join(ref_root, DATA, name + ".rbbi")
        rules[name] = strip_license(open(path, encoding="utf-8").read())
    for name in ("KeywordTokenizer", "Latin-break-only-on-whitespace",
                 "Latin-dont-break-on-hyphens"):
        path = os.path.join(ref_root, TEST, name + ".rbbi")
        rules[name] = strip_license(open(path, encoding="utf-8").read())
    with gzip.open(OUT, "wt", encoding="utf-8", compresslevel=9) as f:
        json.dump(rules, f, ensure_ascii=False)
    print(f"wrote {OUT}: {sorted(rules)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
