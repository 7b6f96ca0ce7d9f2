"""Regenerate the oracle vocabulary for the contributed Snowball
stemmers (Armenian/Basque/Catalan/Irish).

The reference ships no voc.txt/output.txt for these four languages (its
TestSnowballVocabData.zip covers only the 19 core ones), so this tool
builds the oracle the same way the reference's own tests would: compile
the reference's generated org/tartarus/snowball/ext/*Stemmer.java (plus
two tiny local stubs for the Lucene array-growth utils) with the
system javac, run it over a deterministic fuzz vocabulary that
exercises every among entry (every table suffix, each glued onto random
language-alphabet stems, plus random words), and record word -> stem.

Output is pure behavioral DATA (word/stem pairs), same category as the
reference's vocabulary zips.  Requires /root/reference + javac; the
committed tests/data/snowball_contrib_vocab.json.gz is the cached
result so tests run without either.

Usage: python tools/gen_snowball_contrib_vocab.py
"""
from __future__ import annotations

import gzip
import json
import random
import subprocess
import tempfile
from pathlib import Path

REF_EXT = Path("/root/reference/lucene/analysis/common/src/java/org/"
               "tartarus/snowball")
OUT = Path(__file__).resolve().parent.parent / (
    "tests/data/snowball_contrib_vocab.json.gz")

ALPHA = {
    "armenian": "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ",
    "basque": "abdefghijklmnoprstuxz",
    "catalan": "abcdefghijlmnopqrstuvxyzàáèéíïòóúüç·",
    "irish": "abcdefghilmnoprstuáéíóú'-",
}
CLS = {"armenian": "ArmenianStemmer", "basque": "BasqueStemmer",
       "catalan": "CatalanStemmer", "irish": "IrishStemmer"}

ARRAYUTIL = """package org.apache.lucene.util;
public final class ArrayUtil {
  public static int oversize(int n, int b) { return n + (n >> 3) + 8; }
}
"""
RAMUSAGE = """package org.apache.lucene.util;
public final class RamUsageEstimator {
  public static final int NUM_BYTES_CHAR = 2;
}
"""
ORACLE = """import java.io.*;
import java.nio.charset.StandardCharsets;
import org.tartarus.snowball.SnowballProgram;
public class StemOracle {
  public static void main(String[] args) throws Exception {
    SnowballProgram s = (SnowballProgram)
        Class.forName(args[0]).getDeclaredConstructor().newInstance();
    java.lang.reflect.Method stem = s.getClass().getMethod("stem");
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String w;
    while ((w = in.readLine()) != null) {
      s.setCurrent(w); stem.invoke(s); out.println(s.getCurrent());
    }
    out.flush();
  }
}
"""


def build_words(lang: str, tables: dict) -> list[str]:
    rng = random.Random(42)
    suf = [s for t in tables.values() for s, _ in t if s]
    alpha = ALPHA[lang]
    words = set()
    for s in suf:
        words.add(s)
        for _ in range(12):
            stem = "".join(rng.choice(alpha)
                           for _ in range(rng.randint(1, 7)))
            words.add(stem + s)
        words.add(s + "".join(rng.choice(alpha) for _ in range(4)))
    for _ in range(8000):
        words.add("".join(rng.choice(alpha)
                          for _ in range(rng.randint(1, 12))))
    return sorted(words)


def main() -> None:
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from lucene_solr_1_spark.analysis._snowball_contrib_tables import DATA

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        util = td / "org/apache/lucene/util"
        util.mkdir(parents=True)
        (util / "ArrayUtil.java").write_text(ARRAYUTIL)
        (util / "RamUsageEstimator.java").write_text(RAMUSAGE)
        (td / "StemOracle.java").write_text(ORACLE)
        srcs = [str(util / "ArrayUtil.java"),
                str(util / "RamUsageEstimator.java"),
                str(REF_EXT / "Among.java"),
                str(REF_EXT / "SnowballProgram.java"),
                str(td / "StemOracle.java")]
        srcs += [str(REF_EXT / "ext" / f"{c}.java") for c in CLS.values()]
        subprocess.run(["javac", "-d", str(td / "out")] + srcs, check=True)
        vocab = {}
        for lang in CLS:
            words = build_words(lang, DATA[lang]["tables"])
            p = subprocess.run(
                ["java", "-cp", str(td / "out"), "StemOracle",
                 f"org.tartarus.snowball.ext.{CLS[lang]}"],
                input="\n".join(words), capture_output=True,
                text=True, check=True)
            stems = p.stdout.splitlines()
            assert len(stems) == len(words)
            vocab[lang] = list(zip(words, stems))
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    print("wrote", OUT, {k: len(v) for k, v in vocab.items()})


if __name__ == "__main__":
    main()
