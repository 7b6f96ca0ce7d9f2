#!/usr/bin/env python
"""Regenerate analysis/data/rslp_rules.json.gz from the reference's RSLP
rule resources (provenance tool, same category as gen_langid_profiles.py /
gen_mark_ranges.py).

RSLP ("Removedor de Sufixos da Lingua Portuguesa", Orengo & Huyck, *A
Stemming Algorithm for the Portuguese Language*, SPIRE 2001) is a
rule-table stemmer; the Galician adaptation is "Regras do lematizador
para o galego" (bvg.udc.es).  The rule TABLES are published data; the
reference ships them as text resources:

  lucene/analysis/common/src/resources/org/apache/lucene/analysis/pt/portuguese.rslp
  lucene/analysis/common/src/resources/org/apache/lucene/analysis/gl/galician.rslp

and parses them in RSLPStemmerBase.java:255-282 (headerPattern /
stripPattern / repPattern / excPattern).  This tool extracts the tables
into a compact JSON the Python engine (analysis/rslp.py) loads; the
engine itself is implemented from the paper's semantics, not the Java.

Rule format (RSLPStemmerBase.java class javadoc):
  step header: { "name", minWordLen, wholeWordExceptions(0|1), {entry-conds...},
  rule:        { "suffix", minStemLen [, "replacement" [, {exceptions...}]] } ,|};

Usage: python tools/gen_rslp_rules.py [REFDIR] [OUT]
"""
import gzip
import json
import re
import sys

REF = (sys.argv[1] if len(sys.argv) > 1 else
       "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis")
OUT = (sys.argv[2] if len(sys.argv) > 2 else
       "lucene_solr_1_spark/analysis/data/rslp_rules.json.gz")

HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
EXC = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$')


def parse_list(s):
    if not s:
        return []
    return [p.strip()[1:-1] for p in s.split(",")]


def parse_steps(path):
    lines = [ln.strip() for ln in open(path, encoding="utf-8")]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    steps = {}
    i = 0
    while i < len(lines):
        m = HEADER.match(lines[i])
        if not m:
            raise ValueError(f"bad step header at {path}:{i}: {lines[i]}")
        name, minlen, whole, conds = (m.group(1), int(m.group(2)),
                                      int(m.group(3)), parse_list(m.group(4)))
        i += 1
        rules = []
        while i < len(lines):
            ln = lines[i]
            m = STRIP.match(ln)
            if m:
                rules.append([m.group(1), int(m.group(2)), "", []])
            else:
                m = REP.match(ln)
                if m:
                    rules.append([m.group(1), int(m.group(2)), m.group(3), []])
                else:
                    m = EXC.match(ln)
                    if not m:
                        raise ValueError(f"bad rule at {path}:{i}: {ln}")
                    rules.append([m.group(1), int(m.group(2)), m.group(3),
                                  parse_list(m.group(4))])
            i += 1
            if ln.endswith(";"):
                break
        if minlen == 0:  # auto: smallest word a rule could apply to
            minlen = min(r[1] + len(r[0]) for r in rules)
        steps[name] = {"min": minlen, "whole_word_exceptions": bool(whole),
                       "conds": conds, "rules": rules}
    return steps


def main():
    out = {"pt": parse_steps(f"{REF}/pt/portuguese.rslp"),
           "gl": parse_steps(f"{REF}/gl/galician.rslp")}
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False)
    for lang, steps in out.items():
        print(lang, {k: len(v["rules"]) for k, v in steps.items()})


if __name__ == "__main__":
    main()
