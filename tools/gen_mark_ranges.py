"""Regenerate the WB4 Extend/Format character class embedded in
lucene_solr_1_spark/analysis/ubreak.py from the running Python's
Unicode character database (categories Mn | Mc | Me | Cf, minus
U+200B ZERO WIDTH SPACE). Prints the packed range string; paste it
into ubreak.py's _PACKED if the UCD version changes."""

from __future__ import annotations

import textwrap
import unicodedata


def main() -> None:
    ranges: list[list[int]] = []
    cur: list[int] | None = None
    for cp in range(0x110000):
        cat = unicodedata.category(chr(cp))
        ok = cat in ("Mn", "Mc", "Me") or (cat == "Cf" and cp != 0x200B)
        if ok:
            if cur and cp == cur[1] + 1:
                cur[1] = cp
            else:
                cur = [cp, cp]
                ranges.append(cur)
    packed = ",".join(f"{a:x}" if a == b else f"{a:x}:{b:x}"
                      for a, b in ranges)
    print(f"# unicodedata {unicodedata.unidata_version}, "
          f"{len(ranges)} ranges")
    for line in textwrap.wrap(packed, 66):
        print(f'    "{line}"')


if __name__ == "__main__":
    main()
