"""Cache the Danish FOP hyphenation pattern file used by the compound
tests.

da_UTF8.xml is the Apache-FOP adaptation (Carlos Villegas) of Frank
Jensen's public TeX hyphenation patterns for Danish (dkhyph.tex) — the
same public data file the reference's TestCompoundWordTokenFilter
loads.  This tool copies it out of the reference test resources into
tests/data so tests/test_compound.py can run standalone.

Usage: python tools/gen_hyphenation_patterns.py
"""
import gzip
from pathlib import Path

SRC = Path("/root/reference/lucene/analysis/common/src/test/org/apache/"
           "lucene/analysis/compound/da_UTF8.xml")
OUT = Path(__file__).resolve().parent.parent / "tests/data/da_UTF8.xml.gz"

with gzip.open(OUT, "wt", encoding="utf-8") as f:
    f.write(SRC.read_text(encoding="utf-8"))
print("wrote", OUT)
