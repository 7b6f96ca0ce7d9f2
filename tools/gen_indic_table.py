#!/usr/bin/env python3
"""Extract the IndicNormalizer decomposition table from the reference.

Provenance: the table in IndicNormalizer.java:73-222 encodes per-script
canonical compositions from Unicode 5.2 + the UPenn Indian-scripts
chart as {ch0, ch1, ch2(-1=absent, 0xFF=ZWJ), target, script-flag-mask}
rows of codepage offsets.  Pure data — extracted mechanically to JSON
so the Python twin carries no transcription errors.

Run:  python tools/gen_indic_table.py
"""
import json
import pathlib
import re

SRC = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/java/"
    "org/apache/lucene/analysis/in/IndicNormalizer.java")
DST = pathlib.Path(__file__).resolve().parent.parent / (
    "lucene_solr_1_spark/analysis/data/indic_decompositions.json")

FLAGS = {"DEVANAGARI": 1, "BENGALI": 2, "GURMUKHI": 4, "GUJARATI": 8,
         "ORIYA": 16, "TAMIL": 32, "TELUGU": 64, "KANNADA": 128,
         "MALAYALAM": 256}

ROW = re.compile(
    r"\{\s*(0x[0-9A-Fa-f]+|-1)\s*,\s*(0x[0-9A-Fa-f]+|-1)\s*,"
    r"\s*(0x[0-9A-Fa-f]+|-1)\s*,\s*(0x[0-9A-Fa-f]+|-1)\s*,\s*([^}]+)\}")


def main() -> None:
    text = SRC.read_text()
    body = text.split("decompositions[][] = {", 1)[1].split("};", 1)[0]
    rows = []
    for m in ROW.finditer(body):
        ch0, ch1, ch2, tgt = (int(x, 0) for x in m.groups()[:4])
        mask = 0
        for name in re.findall(r"flag\((\w+)\)", m.group(5)):
            mask |= FLAGS[name]
        rows.append([ch0, ch1, ch2, tgt, mask])
    DST.write_text(json.dumps(rows))
    print(f"{len(rows)} decomposition rows -> {DST}")


if __name__ == "__main__":
    main()
