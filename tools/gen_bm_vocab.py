"""Regenerate the Beider-Morse oracle vocabulary.

Runs commons-codec's own PhoneticEngine (from the Spark-classpath jar)
over a deterministic name-shaped fuzz corpus for all six
(name type x rule type) configurations and records input -> encoding.
The committed tests/data/bm_vocab.json.gz is the cached result so
tests/test_beidermorse.py runs without javac or the jar.

Usage: python tools/gen_bm_vocab.py
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import random
import subprocess
import tempfile
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests/data/bm_vocab.json.gz"

ORACLE = """import java.io.*;
import java.nio.charset.StandardCharsets;
import org.apache.commons.codec.language.bm.*;
public class BMOracle {
  public static void main(String[] args) throws Exception {
    PhoneticEngine e = new PhoneticEngine(NameType.valueOf(args[0]),
        RuleType.valueOf(args[1]), Boolean.parseBoolean(args[2]));
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String w;
    while ((w = in.readLine()) != null) { out.println(e.encode(w)); }
    out.flush();
  }
}
"""


def build_words() -> list[str]:
    rng = random.Random(7)
    words = {
        "Angelo", "del Rio", "van der Berg", "von Neumann", "Schwarz",
        "Kowalski", "Mueller", "O'Brien", "McDonald", "Giacometti",
        "Tsoukalas", "Papadopoulos", "Ben Gurion", "bar Kochba",
        "al Rashid", "de la Cruz", "Nguyen", "Ivanov", "Petrescu",
        "Szabo", "Janssen", "Oliveira", "Fernandez", "Moskowitz",
        "Rabinowitz", "Lefebvre", "Dubois", "Costa", "Rossi",
        "Esposito", "Yilmaz", "Aydin", "Horvath", "Novak", "Dvorak",
        "müller", "françois", "björk", "ñandú", "łukasz", "čech",
        "ştefan", "øre", "d'arcy", "o’hara", "Ангелов", "Щербаков",
        "Γιαννόπουλος",
    }
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(800):
        words.add("".join(rng.choice(alpha)
                          for _ in range(rng.randint(2, 10))))
    for _ in range(150):
        words.add("".join(rng.choice(alpha)
                          for _ in range(rng.randint(2, 7))) + " " +
                  "".join(rng.choice(alpha)
                          for _ in range(rng.randint(2, 7))))
    for p in ("de", "del", "de la", "van", "von", "da", "dos", "ben",
              "bar", "al", "el"):
        for _ in range(10):
            words.add(p + " " + "".join(rng.choice(alpha)
                                        for _ in range(rng.randint(3, 8))))
    return sorted(words)


def main() -> None:
    import pyspark
    jar = glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                                 "jars", "commons-codec-*.jar"))[0]
    words = build_words()
    vocab: dict = {}
    with tempfile.TemporaryDirectory() as td:
        (Path(td) / "BMOracle.java").write_text(ORACLE)
        subprocess.run(["javac", "-cp", jar, "BMOracle.java"],
                       cwd=td, check=True)
        for nt in ("GENERIC", "ASHKENAZI", "SEPHARDIC"):
            for rt in ("APPROX", "EXACT"):
                p = subprocess.run(
                    ["java", "-cp", f"{td}:{jar}", "BMOracle",
                     nt, rt, "true"],
                    input="\n".join(words), capture_output=True,
                    text=True, check=True)
                enc = p.stdout.splitlines()
                assert len(enc) == len(words)
                vocab[f"{nt.lower()[:3]}_{rt.lower()}"] = \
                    list(zip(words, enc))
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    print("wrote", OUT, {k: len(v) for k, v in vocab.items()})


if __name__ == "__main__":
    main()
