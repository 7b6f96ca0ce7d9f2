#!/usr/bin/env python3
"""Vendor the ICU utr30/gennorm2 SOURCE data from the reference.

Provenance: the reference builds utr30.nrm from eight gennorm2 text
sources (lucene/analysis/icu/build.xml:61-84, `gennorm2 -s
src/data/utr30 nfc.txt nfkc.txt nfkc_cf.txt BasicFoldings.txt
DiacriticFolding.txt DingbatFolding.txt HanRadicalFolding.txt
NativeDigitFolding.txt`).  We vendor the TEXT sources (Unicode, Inc.
data files, redistribution permitted per their header) and evaluate
the normalization at runtime from them — no ICU binary parsing; see
lucene_solr_1_spark/analysis/icu_norm.py.

Run:  python tools/gen_icu_data.py
"""
import gzip
import pathlib

SRC = pathlib.Path("/root/reference/lucene/analysis/icu/src/data/utr30")
DST = pathlib.Path(__file__).resolve().parent.parent / (
    "lucene_solr_1_spark/analysis/data")

# gennorm2 merge order matters (later files override): keep build.xml order
FILES = ["nfc.txt", "nfkc.txt", "nfkc_cf.txt", "BasicFoldings.txt",
         "DiacriticFolding.txt", "DingbatFolding.txt",
         "HanRadicalFolding.txt", "NativeDigitFolding.txt"]


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    blob = []
    for name in FILES:
        body = (SRC / name).read_text(encoding="utf-8")
        blob.append(f"@@FILE {name}\n{body}")
    out = DST / "icu_utr30_sources.txt.gz"
    with gzip.open(out, "wt", encoding="utf-8", compresslevel=9) as f:
        f.write("\n".join(blob))
    print(f"{len(FILES)} files -> {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
