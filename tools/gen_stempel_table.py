"""Package the reference's Polish stemmer table as repo data.

Provenance tool (run once; output committed): gzips the reference's
stempel resource

    lucene/analysis/stempel/src/resources/org/apache/lucene/analysis/
        pl/stemmer_20000.tbl

into lucene_solr_1_spark/analysis/data/pl_stemmer_20000.tbl.gz, plus
the Polish stopword list.  The table is behavioral DATA (an Egothor
MultiTrie2 of patch commands trained on a 20k-lemma Polish corpus,
Egothor License 1.00 — BSD-style, see the reference's
stempel/src/java/org/egothor/stemmer/*.java headers); the reader and
stemmer algorithm are reimplemented in analysis/stempel.py.

Usage: python tools/gen_stempel_table.py
"""
from __future__ import annotations

import gzip
import shutil
from pathlib import Path

REF = Path("/root/reference/lucene/analysis/stempel/src/resources/org/"
           "apache/lucene/analysis/pl")
OUT_DIR = (Path(__file__).resolve().parent.parent /
           "lucene_solr_1_spark/analysis/data")


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    src = REF / "stemmer_20000.tbl"
    dst = OUT_DIR / "pl_stemmer_20000.tbl.gz"
    with open(src, "rb") as fin, gzip.open(dst, "wb", compresslevel=9) as fo:
        shutil.copyfileobj(fin, fo)
    stop_src = REF / "stopwords.txt"
    stop_dst = OUT_DIR / "pl_stopwords.txt"
    stop_dst.write_bytes(stop_src.read_bytes())
    print(f"wrote {dst} ({dst.stat().st_size} bytes) and {stop_dst}")


if __name__ == "__main__":
    main()
