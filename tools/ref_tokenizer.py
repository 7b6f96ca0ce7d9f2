"""Compile + drive the reference's generated jflex tokenizer DFAs.

Oracle/provenance tool (NOT shipped in the engine): compiles the
reference's *generated* scanners

    lucene/analysis/common/.../standard/StandardTokenizerImpl.java
    lucene/analysis/common/.../standard/UAX29URLEmailTokenizerImpl.java

straight from /root/reference together with tiny constant stubs
(CharTermAttribute / StandardTokenizer / UAX29URLEmailTokenizer hold
only the int token-type constants the Impls reference), then feeds
them text over a base64 pipe.  The generated DFA tables ARE the
grammar, so this gives exact reference tokenization for arbitrary
input — the same trick tools/gen_snowball_contrib_vocab.py uses for
the generated Snowball stemmers.

Usage:
    from tools.ref_tokenizer import tokenize_many
    toks = tokenize_many(["foo.bar http://x.com"], which="standard")
    # -> [[(type:int, start:int, len:int, text:str), ...]]
"""

from __future__ import annotations

import base64
import os
import subprocess
import tempfile

REF = "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/standard"
_CACHE_DIR = os.path.join(tempfile.gettempdir(), "ref_tok_oracle_classes")

_STUB_CTA = """
package org.apache.lucene.analysis.tokenattributes;
public interface CharTermAttribute {
  void copyBuffer(char[] buffer, int offset, int length);
}
"""

_STUB_ST = """
package org.apache.lucene.analysis.standard;
public final class StandardTokenizer {
  public static final int ALPHANUM = 0, APOSTROPHE = 1, ACRONYM = 2,
      COMPANY = 3, EMAIL = 4, HOST = 5, NUM = 6, CJ = 7, ACRONYM_DEP = 8,
      SOUTHEAST_ASIAN = 9, IDEOGRAPHIC = 10, HIRAGANA = 11, KATAKANA = 12,
      HANGUL = 13;
}
"""

_STUB_UAX = """
package org.apache.lucene.analysis.standard;
public final class UAX29URLEmailTokenizer {
  public static final int ALPHANUM = 0, NUM = 1, SOUTHEAST_ASIAN = 2,
      IDEOGRAPHIC = 3, HIRAGANA = 4, KATAKANA = 5, HANGUL = 6, URL = 7,
      EMAIL = 8;
}
"""


def _compile() -> str:
    marker = os.path.join(_CACHE_DIR, "Harness.class")
    if os.path.exists(marker):
        return _CACHE_DIR
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory(prefix="ref_tok_src_") as td:
        tok_attr = os.path.join(td, "org/apache/lucene/analysis/tokenattributes")
        std = os.path.join(td, "org/apache/lucene/analysis/standard")
        os.makedirs(tok_attr)
        os.makedirs(std)
        open(os.path.join(tok_attr, "CharTermAttribute.java"), "w").write(_STUB_CTA)
        open(os.path.join(std, "StandardTokenizer.java"), "w").write(_STUB_ST)
        open(os.path.join(std, "UAX29URLEmailTokenizer.java"), "w").write(_STUB_UAX)
        here = os.path.dirname(os.path.abspath(__file__))
        srcs = [
            os.path.join(REF, "StandardTokenizerInterface.java"),
            os.path.join(REF, "StandardTokenizerImpl.java"),
            os.path.join(REF, "UAX29URLEmailTokenizerImpl.java"),
            os.path.join(tok_attr, "CharTermAttribute.java"),
            os.path.join(std, "StandardTokenizer.java"),
            os.path.join(std, "UAX29URLEmailTokenizer.java"),
            os.path.join(here, "ref_tok_oracle", "Harness.java"),
        ]
        subprocess.run(
            ["javac", "-d", _CACHE_DIR, "-sourcepath", td] + srcs,
            check=True, capture_output=True)
    return _CACHE_DIR


def tokenize_many(texts, which: str = "standard", maxlen: int = 255):
    """Run the reference DFA over texts; returns per-text token lists."""
    classes = _compile()
    lines = []
    for t in texts:
        b64 = base64.b64encode(t.encode("utf-8")).decode("ascii")
        lines.append(f"{which}\t{maxlen}\t{b64}")
    proc = subprocess.run(
        ["java", "-cp", classes, "Harness"],
        input="\n".join(lines) + "\n",
        capture_output=True, text=True, check=True)
    out = []
    for line in proc.stdout.splitlines():
        toks = []
        if line:
            for rec in line.split(";"):
                typ, start, ln, b64 = rec.split(",", 3)
                toks.append((int(typ), int(start), int(ln),
                             base64.b64decode(b64).decode("utf-8")))
        out.append(toks)
    # stdout.splitlines() drops nothing, but if trailing empties were
    # eaten, pad (every input line produces exactly one output line)
    while len(out) < len(texts):
        out.append([])
    return out


if __name__ == "__main__":
    import sys
    texts = sys.argv[2:] or ["foo.bar lucene.apache.org foo:bar 3:30 U.S.A."]
    for t, toks in zip(texts, tokenize_many(texts, which=sys.argv[1] if len(sys.argv) > 1 else "standard")):
        print(repr(t))
        for tok in toks:
            print("   ", tok)
