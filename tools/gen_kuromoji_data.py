#!/usr/bin/env python3
"""Vendor the kuromoji IPADIC binary dictionary data from the reference.

Provenance: the reference ships the compiled IPADIC dictionary as binary
resources under lucene/analysis/kuromoji/src/resources/org/apache/lucene/
analysis/ja/dict/ (Apache-licensed distribution of IPADIC-derived data,
see lucene/analysis/kuromoji/LICENSE.txt in the reference).  This tool
copies them gzipped into lucene_solr_1_spark/analysis/data/ so the
package is standalone.  NOTE: the snapshot does NOT ship
TokenInfoDictionary$buffer.dat (per-entry word costs / connection ids /
readings), so known-word costs are heuristic in our segmenter — see
lucene_solr_1_spark/analysis/kuromoji.py.

Run:  python tools/gen_kuromoji_data.py
"""
import gzip
import pathlib

SRC = pathlib.Path(
    "/root/reference/lucene/analysis/kuromoji/src/resources/"
    "org/apache/lucene/analysis/ja/dict")
DST = pathlib.Path(__file__).resolve().parent.parent / (
    "lucene_solr_1_spark/analysis/data")

FILES = {
    "CharacterDefinition.dat": "ja_chardef.dat.gz",
    "ConnectionCosts.dat": "ja_conncosts.dat.gz",
    "TokenInfoDictionary$fst.dat": "ja_tokeninfo_fst.dat.gz",
    "TokenInfoDictionary$posDict.dat": "ja_tokeninfo_pos.dat.gz",
    "TokenInfoDictionary$targetMap.dat": "ja_tokeninfo_targetmap.dat.gz",
    "UnknownDictionary$buffer.dat": "ja_unk_buffer.dat.gz",
    "UnknownDictionary$posDict.dat": "ja_unk_pos.dat.gz",
    "UnknownDictionary$targetMap.dat": "ja_unk_targetmap.dat.gz",
    "../stopwords.txt": "ja_stopwords.txt.gz",
    "../stoptags.txt": "ja_stoptags.txt.gz",
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
