#!/usr/bin/env python3
"""Vendor the smartcn core dictionary data from the reference.

Provenance: the reference ships the SmartChineseAnalyzer core word
dictionary as a Java-serialized resource (coredict.mem: short[]
hash-index table, char[] char table, char[][][] per-first-char word
arrays, int[][] frequencies — WordDictionary.java:152-160) plus the
default stopword list.  NOTE: the snapshot does NOT ship
bigramdict.mem (word-pair frequencies), so all bigram frequencies are
0 in our twin — identical to the reference's unseen-bigram smoothing
path; see lucene_solr_1_spark/analysis/smartcn.py.

Run:  python tools/gen_smartcn_data.py
"""
import gzip
import pathlib

SRC = pathlib.Path(
    "/root/reference/lucene/analysis/smartcn/src/resources/"
    "org/apache/lucene/analysis/cn/smart")
DST = pathlib.Path(__file__).resolve().parent.parent / (
    "lucene_solr_1_spark/analysis/data")

FILES = {
    "hhmm/coredict.mem": "zh_coredict.mem.gz",
    "stopwords.txt": "zh_stopwords.txt.gz",
}


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    for src_name, dst_name in FILES.items():
        raw = (SRC / src_name).read_bytes()
        out = DST / dst_name
        with gzip.open(out, "wb", compresslevel=9) as f:
            f.write(raw)
        print(f"{src_name}: {len(raw)} -> {out.stat().st_size} bytes ({out.name})")


if __name__ == "__main__":
    main()
