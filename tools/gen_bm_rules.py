"""Regenerate the Beider-Morse rule tables from Apache commons-codec.

The reference's BeiderMorseFilter (lucene/analysis/phonetic/src/java/
.../BeiderMorseFilter.java:1) delegates to commons-codec's
org.apache.commons.codec.language.bm.PhoneticEngine, whose rule data
ships as text resources inside the commons-codec jar (Apache-2.0; the
same jar is on this container's Spark classpath).  This tool extracts
and parses those resources into one structured JSON data file:

  * languages per name type (gen/ash/sep)
  * language-guessing rules (<nt>_lang.txt)
  * phonetic rules (<nt>_<rules|approx|exact>_<lang>.txt), with
    #include directives inlined and each line split into
    (pattern, left context, right context, phoneme expression)

Output is pure linguistic DATA — the engine itself is hand-written in
lucene_solr_1_spark/analysis/beidermorse.py.

Usage: python tools/gen_bm_rules.py
Writes: lucene_solr_1_spark/analysis/data/bm_rules.json.gz
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import zipfile
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / (
    "lucene_solr_1_spark/analysis/data/bm_rules.json.gz")
PREFIX = "org/apache/commons/codec/language/bm/"
NAME_TYPES = ("gen", "ash", "sep")
RULE_TYPES = ("rules", "approx", "exact")

_QUOTED = re.compile(r'"([^"]*)"')


def _find_jar() -> str:
    import pyspark
    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                                  "jars", "commons-codec-*.jar"))
    if not jars:
        raise FileNotFoundError("commons-codec jar not on Spark classpath")
    return jars[0]


def _strip_comments(text: str) -> list[str]:
    """Drop /* */ blocks and // line comments, return non-blank lines."""
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    lines = []
    for line in text.splitlines():
        # a // comment starts outside quotes; quotes never contain //
        idx = line.find("//")
        if idx >= 0:
            line = line[:idx]
        line = line.strip()
        if line:
            lines.append(line)
    return lines


def parse_rule_lines(name: str, raw: dict[str, str]) -> list[list[str]]:
    out = []
    for line in _strip_comments(raw[name]):
        if line.startswith("#include"):
            inc = line.split()[1].strip()
            out.extend(parse_rule_lines(inc + ".txt", raw))
            continue
        parts = _QUOTED.findall(line)
        if len(parts) != 4:
            raise ValueError(f"{name}: bad rule line {line!r}")
        out.append(parts)
    return out


def main() -> None:
    jar = _find_jar()
    raw = {}
    with zipfile.ZipFile(jar) as z:
        for info in z.namelist():
            if info.startswith(PREFIX) and info.endswith(".txt"):
                raw[info[len(PREFIX):]] = z.read(info).decode("utf-8")

    data: dict = {"languages": {}, "lang_rules": {}, "rules": {}}
    for nt in NAME_TYPES:
        data["languages"][nt] = _strip_comments(raw[f"{nt}_languages.txt"])
        lrules = []
        for line in _strip_comments(raw[f"{nt}_lang.txt"]):
            pat, langs, accept = line.split()
            lrules.append([pat, langs.split("+"), accept == "true"])
        data["lang_rules"][nt] = lrules
        data["rules"][nt] = {}
        for rt in RULE_TYPES:
            data["rules"][nt][rt] = {}
            for fname in raw:
                m = re.match(rf"{nt}_{rt}_(\w+)\.txt$", fname)
                if m:
                    data["rules"][nt][rt][m.group(1)] = \
                        parse_rule_lines(fname, raw)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False)
    n = sum(len(v) for nt in data["rules"].values()
            for rt in nt.values() for v in rt.values())
    print("wrote", OUT, f"{n} rules from", os.path.basename(jar))


if __name__ == "__main__":
    main()
