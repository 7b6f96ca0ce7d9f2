"""Extract the ASCIITLD list into analysis/data/ascii_tlds.txt.

The reference's ASCIITLD.jflex-macro is generated from the public IANA
Root Zone Database (the macro header records the zone-file version:
July 14, 2012); this tool extracts the TLD strings (data, not code)
so the UAX29URLEmail tokenizer recognizes exactly the reference's TLD
set. Regenerate with:  python tools/gen_ascii_tlds.py
"""

from __future__ import annotations

import os
import re

SRC = ("/root/reference/lucene/analysis/common/src/java/org/apache/lucene/"
       "analysis/standard/ASCIITLD.jflex-macro")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lucene_solr_1_spark", "analysis", "data", "ascii_tlds.txt")


def main():
    tlds = []
    for line in open(SRC):
        line = line.strip()
        if not (line.startswith("|") or line.startswith("[")):
            continue
        # rows mix case-pair classes with literal digits/dashes:
        #   | [aA][eE][rR][oO]
        #   | [xX][nN]--0[zZ][wW][mM]56[dD]
        body = line.lstrip("|").strip()
        tld = []
        ok = True
        for tok in re.findall(r"\[(.)(.)\]|([0-9\-])", body):
            a, b, lit = tok
            if lit:
                tld.append(lit)
            elif a.upper() == b.upper():
                tld.append(a.lower())
            else:
                ok = False
                break
        # reject rows that contain anything else (comments etc.)
        if ok and tld and re.fullmatch(
                r"(?:\[..\]|[0-9\-])+", body):
            tlds.append("".join(tld))
    assert len(tlds) > 300, len(tlds)
    with open(OUT, "w") as f:
        f.write("\n".join(tlds) + "\n")
    print(f"wrote {OUT}: {len(tlds)} TLDs")


if __name__ == "__main__":
    main()
