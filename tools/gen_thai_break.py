"""Regenerate analysis/data/thai_break.json.gz from the local JDK.

Provenance tool (same category as gen_langid_profiles.py / gen_mark_ranges.py):
the Thai word-segmentation twin in analysis/thai.py needs two public data
tables that every OpenJDK ships inside its jimage (`$JAVA_HOME/lib/modules`,
module jdk.localedata):

* ``sun/text/resources/ext/thai_dict`` — the Thai word dictionary used by
  ``java.text.BreakIterator.getWordInstance(new Locale("th"))``; a
  column-compressed trie in sun.text.BreakDictionary's file format
  (version header, CompactByteArray column map, row index / populated-cell
  bitmaps / row shifts, flat state table).  The word list itself derives
  from the ICU Thai dictionary (Unicode license).
* ``sun/text/resources/ext/WordBreakIteratorData_th`` — the compiled
  rule DFA ("BIdata" format) for the Thai word BreakIterator: forward
  state table (20 states x 24 categories), end/lookahead state flags,
  BMP char->category CompactByteArray, supplementary ranges, and the
  per-category dictionary flags used by sun.text.DictionaryBasedBreakIterator.

This matters because the reference's ThaiWordFilter
(analysis/common/src/java/org/apache/lucene/analysis/th/ThaiWordFilter.java:52)
is a thin wrapper over exactly that JRE break iterator, so byte-exact Thai
tokenization parity means twinning the JRE data, not Lucene code.

Usage:  python tools/gen_thai_break.py  [JAVA_HOME]
"""
from __future__ import annotations

import gzip
import json
import os
import struct
import subprocess
import sys
import tempfile

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "lucene_solr_1_spark", "analysis", "data",
                   "thai_break.json.gz")


def _extract(java_home: str, tmp: str) -> tuple[bytes, bytes]:
    jimage = os.path.join(java_home, "bin", "jimage")
    modules = os.path.join(java_home, "lib", "modules")
    subprocess.run(
        [jimage, "extract", "--include",
         "regex:.*(thai_dict|WordBreakIteratorData_th)$",
         "--dir", tmp, modules],
        check=True)
    base = os.path.join(tmp, "jdk.localedata", "sun", "text", "resources", "ext")
    with open(os.path.join(base, "thai_dict"), "rb") as f:
        dict_bytes = f.read()
    with open(os.path.join(base, "WordBreakIteratorData_th"), "rb") as f:
        rule_bytes = f.read()
    return dict_bytes, rule_bytes


def decode_dictionary(d: bytes) -> dict:
    off = [8]  # skip int32 version (=1) + int32 payload length

    def rint() -> int:
        v = struct.unpack_from(">i", d, off[0])[0]
        off[0] += 4
        return v

    l1 = rint()
    col_index = list(struct.unpack_from(">%dH" % l1, d, off[0])); off[0] += 2 * l1
    l2 = rint()
    col_values = list(d[off[0]:off[0] + l2]); off[0] += l2
    num_cols = rint()
    rint()  # numColGroups
    l3 = rint()
    row_index = list(struct.unpack_from(">%dH" % l3, d, off[0])); off[0] += 2 * l3
    l4 = rint()
    rif_index = list(struct.unpack_from(">%dh" % l4, d, off[0])); off[0] += 2 * l4
    l5 = rint()
    rif = list(struct.unpack_from(">%di" % l5, d, off[0])); off[0] += 4 * l5
    l6 = rint()
    row_shifts = list(struct.unpack_from(">%db" % l6, d, off[0])); off[0] += l6
    l7 = rint()
    table = list(struct.unpack_from(">%dh" % l7, d, off[0])); off[0] += 2 * l7
    return {
        "col_index": col_index, "col_values": col_values,
        "num_cols": num_cols, "row_index": row_index,
        "rif_index": rif_index, "rif": rif,
        "row_shifts": row_shifts, "table": table,
    }


def decode_rules(d: bytes) -> dict:
    assert d[:7] == b"BIdata\x00" and d[7] == 1, "unexpected BIdata header"
    ints = struct.unpack_from(">8i", d, 12)
    off = 48
    num_cat = 24
    state_table = list(struct.unpack_from(">%dh" % ints[0], d, off)); off += ints[0] * 2
    off += ints[1] * 2  # backwards state table (unused: forward iteration only)
    end_states = list(d[off:off + ints[2]]); off += ints[2]
    lookahead_states = list(d[off:off + ints[3]]); off += ints[3]
    cat_index = list(struct.unpack_from(">512H", d, off)); off += 1024
    cat_values = list(d[off:off + ints[4]]); off += ints[4]
    supp = [[int.from_bytes(d[off + 4 * i:off + 4 * i + 3], "big"),
             d[off + 4 * i + 3]] for i in range(ints[5])]
    off += ints[5] * 4
    dict_flags = list(d[off:off + ints[6]])
    assert ints[0] % num_cat == 0 and len(end_states) == ints[0] // num_cat
    return {
        "num_categories": num_cat, "state_table": state_table,
        "end_states": end_states, "lookahead_states": lookahead_states,
        "cat_index": cat_index, "cat_values": cat_values,
        "supp": supp, "dict_flags": dict_flags,
    }


def enumerate_words(dic: dict) -> list[str]:
    """Walk the trie and list every word (for tests/documentation)."""
    col_of = {}
    for cp in range(0x10000):
        col = dic["col_values"][dic["col_index"][cp >> 7] + (cp & 0x7F)]
        if col:
            col_of.setdefault(col, chr(cp))

    def nxt(state: int, col: int) -> int:
        f = dic["rif_index"][state]
        if f < 0:
            if col != -f:
                return 0
        elif not ((dic["rif"][f + (col >> 5)] >> (col & 31)) & 1):
            return 0
        return dic["table"][dic["row_index"][state] * dic["num_cols"]
                            + col + dic["row_shifts"][state]]

    out: list[str] = []
    stack = [(0, "")]
    while stack:
        state, prefix = stack.pop()
        if state != 0 and nxt(state, 0) == -1:
            out.append(prefix)
        for col, ch in col_of.items():
            ns = nxt(state, col)
            if ns == -1:
                out.append(prefix + ch)
            elif ns != 0:
                stack.append((ns, prefix + ch))
    return sorted(out)


def main() -> None:
    java_home = sys.argv[1] if len(sys.argv) > 1 else os.environ["JAVA_HOME"]
    with tempfile.TemporaryDirectory() as tmp:
        dict_bytes, rule_bytes = _extract(java_home, tmp)
    data = {
        "provenance": "decoded from OpenJDK jdk.localedata "
                      "(sun/text/resources/ext/{thai_dict,WordBreakIteratorData_th}); "
                      "regenerate with tools/gen_thai_break.py",
        "dictionary": decode_dictionary(dict_bytes),
        "rules": decode_rules(rule_bytes),
    }
    words = enumerate_words(data["dictionary"])
    data["word_count"] = len(words)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(data, f, separators=(",", ":"))
    print(f"wrote {OUT}: {len(words)} dictionary words, "
          f"{len(data['rules']['state_table']) // 24} rule states")


if __name__ == "__main__":
    main()
