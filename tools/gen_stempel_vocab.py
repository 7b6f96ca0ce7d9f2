"""Regenerate the stempel parity-oracle vocabulary.

Compiles the reference's Egothor stemmer package (org/egothor/stemmer —
pure Java, no Lucene deps) plus a tiny driver with the system javac,
loads the reference's own stemmer_20000.tbl, and records word -> stem
for a deterministic fuzz vocabulary that exercises the backward
MultiTrie2 paths: random Polish-alphabet words, Polish stopwords and
test words with mutated endings, and short/edge-length strings.

Output is behavioral DATA (word/stem pairs) cached in
tests/data/stempel_vocab.json.gz so tests run without javac or
/root/reference.

Usage: python tools/gen_stempel_vocab.py
"""
from __future__ import annotations

import base64
import gzip
import json
import random
import shutil
import subprocess
import tempfile
from pathlib import Path

REF = Path("/root/reference/lucene/analysis/stempel/src")
OUT = Path(__file__).resolve().parent.parent / "tests/data/stempel_vocab.json.gz"

DRIVER = """import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.Base64;
import org.egothor.stemmer.*;

public class StempelOracle {
  public static void main(String[] args) throws Exception {
    DataInputStream in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(args[0])));
    String method = in.readUTF().toUpperCase(java.util.Locale.ROOT);
    Trie trie = (method.indexOf('M') < 0)
        ? new Trie(in) : new MultiTrie2(in);
    in.close();
    BufferedReader r = new BufferedReader(new InputStreamReader(
        System.in, StandardCharsets.UTF_8));
    PrintWriter w = new PrintWriter(new OutputStreamWriter(
        System.out, StandardCharsets.UTF_8));
    String line;
    StringBuilder buffer = new StringBuilder();
    while ((line = r.readLine()) != null) {
      String word = new String(Base64.getDecoder().decode(line),
                               StandardCharsets.UTF_8);
      // StempelStemmer.stem inlined (ref: StempelStemmer.java:85)
      CharSequence cmd = trie.getLastOnPath(word);
      String res;
      if (cmd == null) {
        res = null;
      } else {
        buffer.setLength(0);
        buffer.append(word);
        Diff.apply(buffer, cmd);
        res = buffer.length() > 0 ? buffer.toString() : null;
      }
      w.println(res == null ? "-" : Base64.getEncoder()
          .encodeToString(res.getBytes(StandardCharsets.UTF_8)));
    }
    w.flush();
  }
}
"""

ALPHA = "aąbcćdeęfghijklłmnńoópqrsśtuvwxyzźż"
SUFFIXES = ["a", "i", "y", "e", "ą", "ę", "em", "om", "ach", "ami", "owie",
            "ów", "owi", "u", "o", "ie", "cie", "ła", "ło", "ły", "li",
            "łem", "łam", "ać", "eć", "ić", "yć", "ować", "ność", "nym",
            "nego", "nemu", "ych", "ego", "ej", "ą", "ami", "ka", "ki",
            "ek", "ko", "kiem", "stwo", "stwa", "enie", "anie", "aniu",
            "eniu", "ista", "izm", "arz", "acja", "acji", "acją", "ce",
            "cy", "czy", "szy", "ejszy", "owie", "niej"]
SEEDS = ["student", "studenta", "studenci", "studentów", "książka",
         "książki", "komputer", "komputery", "polski", "polska",
         "warszawa", "kraków", "pisać", "piszę", "napisał", "czytanie",
         "nauczyciel", "dziecko", "dzieci", "miasto", "miasta",
         "człowiek", "ludzie", "praca", "pracować", "pracownik",
         "szybko", "szybki", "najszybszy", "dom", "domu", "domach",
         "kot", "kota", "kotów", "pies", "psa", "psów", "ręka", "ręce",
         "rąk", "oko", "oczy", "noga", "nogi", "drzewo", "drzewa"]


def build_vocab() -> list[str]:
    rng = random.Random(20260818)
    vocab = set(SEEDS)
    stop = (REF / "resources/org/apache/lucene/analysis/pl/stopwords.txt")
    for line in stop.read_text("utf-8").splitlines():
        if not line.startswith("#") and line.strip():
            vocab.add(line.strip())
    # seeds with mutated endings
    for seed in list(vocab):
        base = seed[:max(2, len(seed) - 2)]
        for suf in SUFFIXES:
            vocab.add(base + suf)
    # random fuzz words (the backward tries key on endings, so random
    # stems + real suffixes give deep path coverage)
    for _ in range(30000):
        stem = "".join(rng.choice(ALPHA)
                       for _ in range(rng.randint(1, 10)))
        vocab.add(stem)
        vocab.add(stem + rng.choice(SUFFIXES))
    # edge lengths incl. the filter's min-length boundary
    for ch in ALPHA:
        vocab.add(ch)
        vocab.add(ch * 2)
        vocab.add(ch * 4)
    return sorted(vocab)


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="stempel_oracle"))
    src = tmp / "src"
    pkg = src / "org/egothor/stemmer"
    pkg.mkdir(parents=True)
    for f in (REF / "java/org/egothor/stemmer").glob("*.java"):
        shutil.copy(f, pkg / f.name)
    (src / "StempelOracle.java").write_text(DRIVER)
    classes = tmp / "classes"
    classes.mkdir()
    subprocess.run(
        ["javac", "-d", str(classes), str(src / "StempelOracle.java")]
        + [str(p) for p in pkg.glob("*.java")],
        check=True, capture_output=True)
    vocab = build_vocab()
    table = REF / "resources/org/apache/lucene/analysis/pl/stemmer_20000.tbl"
    feed = "\n".join(base64.b64encode(w.encode()).decode() for w in vocab)
    proc = subprocess.run(
        ["java", "-cp", str(classes), "StempelOracle", str(table)],
        input=feed, capture_output=True, text=True, check=True)
    lines = proc.stdout.splitlines()
    assert len(lines) == len(vocab), (len(lines), len(vocab))
    pairs = {}
    for w, line in zip(vocab, lines):
        pairs[w] = (None if line == "-"
                    else base64.b64decode(line).decode())
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as fo:
        json.dump(pairs, fo, ensure_ascii=False)
    nulls = sum(1 for v in pairs.values() if v is None)
    print(f"wrote {OUT}: {len(pairs)} words ({nulls} null stems)")


if __name__ == "__main__":
    main()
