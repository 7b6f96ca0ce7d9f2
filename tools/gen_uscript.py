"""Generate Unicode script-property ranges for the ICU segmentation twin.

The ICU tokenizer (reference: lucene/analysis/icu/src/java/org/apache/
lucene/analysis/icu/segmentation/ScriptIterator.java) splits text into
same-script runs via UScript.getScript(cp).  Python's unicodedata does
not expose the Script property, so this tool extracts it from the
public `regex` package's bundled Unicode Character Database (the same
public UCD that ICU compiles) and writes a packed range table:

    lucene_solr_1_spark/analysis/data/uscript_ranges.json.gz
      {"scripts": [[long, short], ...],            # index = script id
       "ranges": [[lo, hi, id], ...]}              # sorted by lo

Script id 0 = Unknown/Zzzz, 1 = Common/Zyyy, and Inherited keeps the
id the regex UCD assigns; the loader (analysis/uniprops.py) remaps to
the ICU convention COMMON=0 < INHERITED=1 < everything else, which the
ScriptIterator's `scriptCode <= INHERITED` merge test relies on.

Usage: python tools/gen_uscript.py   (rewrites the data file in place)
"""

from __future__ import annotations

import gzip
import json
import os
import sys

from regex import _regex

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lucene_solr_1_spark", "analysis", "data",
                   "uscript_ranges.json.gz")


def main() -> None:
    prop_id, values = _regex.get_properties()["SCRIPT"]
    # group aliases by value id: the ISO-15924 short code is 4 chars;
    # the long name is the longest alias (ties: alphabetical).
    by_id: dict[int, list[str]] = {}
    for name, vid in values.items():
        by_id.setdefault(vid, []).append(name)
    names: list[tuple[str, str]] = []
    for vid in range(max(by_id) + 1):
        aliases = by_id.get(vid, [f"SCRIPT{vid}"])
        # ISO-15924 short code: a 4-char alias (skip deprecated QAA*);
        # long name: the longest non-short alias, else the short one.
        shorts = sorted(a for a in aliases
                        if len(a) == 4 and not a.startswith("QAA"))
        short = shorts[0] if shorts else sorted(aliases, key=len)[0][:4]
        longs = sorted((a for a in aliases if a != short),
                       key=lambda s: (-len(s), s))
        long = longs[0] if longs else short
        names.append((long.title(), short.title()))

    import regex as re
    all_cps = "".join(chr(c) for c in range(0x110000)
                      if not 0xD800 <= c <= 0xDFFF)
    script = [0] * 0x110000
    for vid in range(len(names)):
        pat = re.compile(r"\p{Script=%s}" % names[vid][0])
        for m in pat.finditer(all_cps):
            script[ord(m.group())] = vid

    ranges: list[list[int]] = []
    lo = 0
    for cp in range(1, 0x110001):
        if cp == 0x110000 or script[cp] != script[lo]:
            if script[lo] != 0:
                ranges.append([lo, cp - 1, script[lo]])
            lo = cp
    payload = {"scripts": names, "ranges": ranges}
    with gzip.open(OUT, "wt", encoding="ascii") as f:
        json.dump(payload, f, separators=(",", ":"))
    print(f"wrote {OUT}: {len(names)} scripts, {len(ranges)} ranges",
          file=sys.stderr)


if __name__ == "__main__":
    main()
