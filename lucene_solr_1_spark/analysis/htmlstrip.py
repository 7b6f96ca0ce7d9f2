"""HTML -> text extraction, vectorized over pandas.

Plays the role of the reference's two HTML paths:
  * DemoHTMLParser (title, body text) extraction
    (ref: lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/
     feeds/DemoHTMLParser.java:42-125), and
  * HTMLStripCharFilter — SCRIPT/STYLE contents removed, tags stripped
    (ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
     charfilter/HTMLStripCharFilter.java:46, script/style handling).

Deterministic spec (golden-tested; FIXTURES.md requires the extracted
text to be byte-identical per url to the oracle):

  1. remove <script>...</script> and <style>...</style> blocks
     (case-insensitive, non-greedy),
  2. turn ``</title>`` into a single ``\\n`` (title/body separator),
  3. strip every remaining ``<...>`` tag,
  4. decode the five standard entities &amp; &lt; &gt; &quot; &#39;.

No whitespace normalization beyond that: the fixture generator emits
HTML whose stripped form is exactly the golden text, so the invariant
is end-to-end meaningful without a lossy canonicalizer.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["extract_text_series", "extract_text"]

_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_TITLE_END_RE = r"(?i)</title>"
_TAG_RE = r"(?s)<[^>]*>"

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text_series(html: pd.Series) -> pd.Series:
    """Series[bytes|str] of HTML -> Series[str] of extracted text."""
    s = html
    if len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
        s = s.map(lambda b: b.decode("utf-8", errors="replace"))
    s = s.fillna("")
    s = s.str.replace(_SCRIPT_RE, "", regex=True)
    s = s.str.replace(_STYLE_RE, "", regex=True)
    s = s.str.replace(_TITLE_END_RE, "\n", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s


def extract_text(html: bytes | str) -> str:
    return extract_text_series(pd.Series([html])).iloc[0]
