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
WIKIREF = "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/wikipedia"
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

_STUB_WIKI = """
package org.apache.lucene.analysis.wikipedia;
public final class WikipediaTokenizer {
  public static final int ALPHANUM_ID = 0, APOSTROPHE_ID = 1, ACRONYM_ID = 2,
      COMPANY_ID = 3, EMAIL_ID = 4, HOST_ID = 5, NUM_ID = 6, CJ_ID = 7,
      INTERNAL_LINK_ID = 8, EXTERNAL_LINK_ID = 9, CITATION_ID = 10,
      CATEGORY_ID = 11, BOLD_ID = 12, ITALICS_ID = 13, BOLD_ITALICS_ID = 14,
      HEADING_ID = 15, SUB_HEADING_ID = 16, EXTERNAL_LINK_URL_ID = 17;
  public static final String[] TOKEN_TYPES = new String[] {
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>", "<EMAIL>",
    "<HOST>", "<NUM>", "<CJ>", "il", "el", "ci", "c", "b", "i", "bi",
    "h", "sh", "elu"};
}
"""

# same-package driver: getText/reset on the generated scanner are
# package-private, so the record loop lives here
_STUB_WIKIORACLE = """
package org.apache.lucene.analysis.wikipedia;
import java.io.StringReader;
import java.nio.charset.StandardCharsets;
import java.util.Base64;
public final class WikiOracle {
  static final class Grab implements org.apache.lucene.analysis.tokenattributes.CharTermAttribute {
    String text = "";
    public void copyBuffer(char[] buffer, int offset, int length) {
      text = new String(buffer, offset, length);
    }
  }
  public static String scan(String text, int maxlen) throws java.io.IOException {
    WikipediaTokenizerImpl w = new WikipediaTokenizerImpl(new StringReader(text));
    w.reset();
    StringBuilder sb = new StringBuilder();
    Grab grab = new Grab();
    Base64.Encoder enc = Base64.getEncoder();
    int type;
    while ((type = w.getNextToken()) != WikipediaTokenizerImpl.YYEOF) {
      int len = w.yylength();
      if (len > maxlen) continue;
      w.getText(grab);
      if (sb.length() > 0) sb.append(';');
      sb.append(type).append(',').append(w.yychar()).append(',')
        .append(len).append(',').append(w.getPositionIncrement()).append(',')
        .append(enc.encodeToString(grab.text.getBytes(StandardCharsets.UTF_8)));
    }
    return sb.toString();
  }
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
        wiki = os.path.join(td, "org/apache/lucene/analysis/wikipedia")
        os.makedirs(tok_attr)
        os.makedirs(std)
        os.makedirs(wiki)
        open(os.path.join(tok_attr, "CharTermAttribute.java"), "w").write(_STUB_CTA)
        open(os.path.join(std, "StandardTokenizer.java"), "w").write(_STUB_ST)
        open(os.path.join(std, "UAX29URLEmailTokenizer.java"), "w").write(_STUB_UAX)
        open(os.path.join(wiki, "WikipediaTokenizer.java"), "w").write(_STUB_WIKI)
        open(os.path.join(wiki, "WikiOracle.java"), "w").write(_STUB_WIKIORACLE)
        here = os.path.dirname(os.path.abspath(__file__))
        srcs = [
            os.path.join(REF, "StandardTokenizerInterface.java"),
            os.path.join(REF, "StandardTokenizerImpl.java"),
            os.path.join(REF, "UAX29URLEmailTokenizerImpl.java"),
            os.path.join(WIKIREF, "WikipediaTokenizerImpl.java"),
            os.path.join(tok_attr, "CharTermAttribute.java"),
            os.path.join(std, "StandardTokenizer.java"),
            os.path.join(std, "UAX29URLEmailTokenizer.java"),
            os.path.join(wiki, "WikipediaTokenizer.java"),
            os.path.join(wiki, "WikiOracle.java"),
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
    wiki = which == "wikipedia"
    for line in proc.stdout.splitlines():
        toks = []
        if line:
            for rec in line.split(";"):
                if wiki:  # type,start,len,posInc,b64(text)
                    typ, start, ln, pinc, b64 = rec.split(",", 4)
                    toks.append((int(typ), int(start), int(ln),
                                 base64.b64decode(b64).decode("utf-8"),
                                 int(pinc)))
                else:
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
