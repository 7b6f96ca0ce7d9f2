"""ExtractingRequestHandler ("Solr Cell") — binary content extraction.

Reference: ``solr/contrib/extraction/src/java/org/apache/solr/handler/
extraction/`` — ``ExtractingDocumentLoader.java`` (detect type, run the
parser, feed a SolrContentHandler), ``SolrContentHandler.java:90-260``
(document assembly order literals -> metadata -> content, with the
naming rules: lowernames maps every non-letter-or-digit char to '_'
and lowercases, then ``fmap.<src>`` renames, then unknown fields get
``uprefix`` or fall through to ``defaultField``; ``literalsOverride``
suppresses extracted values for literal field names), and
``ExtractingParams.java`` for the parameter surface.

The reference delegates parsing to Tika; this twin routes by magic
bytes to the repo's own stdlib codecs — HTMLStripCharFilter text for
HTML, header parses for PNG/JPEG/GIF/BMP (dimensions), WAV/FLAC/AVI
(audio/video facts), UTF-8 passthrough for plain text — emitting
Tika-style metadata names (``Content-Type``, ``stream_size``, ...).

Spark surface: ``extract_df`` is one narrow ``mapInArrow`` over the
binary column (zero shuffle; a 100-TB crawl extracts embarrassingly
parallel), emitting the assembled document as typed columns + a
metadata map.
"""

from __future__ import annotations

import struct

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["detect_content_type", "extract_content", "SolrContentHandler",
           "extract_df"]


def detect_content_type(data: bytes) -> str:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:2] == b"\xff\xd8":
        return "image/jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/x-wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "video/x-msvideo"
    if data[:4] == b"fLaC":
        return "audio/flac"
    head = data[:512].lstrip().lower()
    if head.startswith((b"<html", b"<!doctype html")) or b"<html" in head:
        return "text/html"
    try:
        data.decode("utf-8")
        return "text/plain"
    except UnicodeDecodeError:
        return "application/octet-stream"


def _jpeg_dims(data: bytes) -> tuple[int, int] | None:
    i = 2
    while i + 9 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return w, h
        i += 2 + seglen
    return None


def extract_content(data: bytes) -> tuple[str, str, dict[str, str]]:
    """(content_type, text, metadata) — the loader's parse step.

    Truncated/corrupt binaries degrade to (type, "", base metadata)
    instead of raising: at crawl scale short blobs are guaranteed, and
    one bad record must not fail the stage."""
    ctype = detect_content_type(data)
    meta: dict[str, str] = {"Content-Type": ctype,
                            "stream_size": str(len(data))}
    try:
        text = _extract_typed(data, ctype, meta)
    except (struct.error, IndexError, ValueError):
        text = ""
    return ctype, text, meta


def _extract_typed(data: bytes, ctype: str, meta: dict[str, str]) -> str:
    text = ""
    if ctype == "text/html":
        from ..analysis.htmlstrip import extract_text
        import re
        html = data.decode("utf-8", "replace")
        text = extract_text(html)
        m = re.search(r"<title[^>]*>(.*?)</title>", html, re.S | re.I)
        if m:
            meta["title"] = " ".join(m.group(1).split())
    elif ctype == "text/plain":
        text = data.decode("utf-8")
    elif ctype == "image/png":
        w, h = struct.unpack(">II", data[16:24])
        meta["width"], meta["height"] = str(w), str(h)
    elif ctype == "image/jpeg":
        dims = _jpeg_dims(data)
        if dims:
            meta["width"], meta["height"] = str(dims[0]), str(dims[1])
    elif ctype == "image/gif":
        w, h = struct.unpack("<HH", data[6:10])
        meta["width"], meta["height"] = str(w), str(h)
    elif ctype == "image/bmp":
        w, h = struct.unpack("<ii", data[18:26])
        meta["width"], meta["height"] = str(w), str(abs(h))
    elif ctype == "audio/x-wav":
        ch, rate = struct.unpack("<HI", data[22:28])
        bits = struct.unpack("<H", data[34:36])[0]
        meta["channels"], meta["samplerate"] = str(ch), str(rate)
        meta["bits"] = str(bits)
    elif ctype == "audio/flac":
        # STREAMINFO: fLaC(4) + block header(4) + blocksizes(4) +
        # framesizes(6) -> the 20-bit sample rate starts at byte 18
        b = data[18:22]
        rate = (b[0] << 12) | (b[1] << 4) | (b[2] >> 4)
        ch = ((b[2] >> 1) & 0x7) + 1
        meta["channels"], meta["samplerate"] = str(ch), str(rate)
    elif ctype == "video/x-msvideo":
        usec, = struct.unpack("<I", data[32:36])
        frames, = struct.unpack("<I", data[48:52])
        meta["frames"] = str(frames)
        if usec:
            meta["fps"] = str(round(1_000_000 / usec, 3))
    return text


class SolrContentHandler:
    """Document assembly twin (SolrContentHandler.java:90-260).

    ``known_fields`` plays the schema role: a mapped name not in it
    takes ``uprefix`` (if set), else falls through to ``defaultField``
    (if set), else the value is dropped — the reference's three-step
    naming rule verbatim.
    """

    def __init__(self, params: dict | None = None,
                 known_fields: set[str] | None = None):
        p = params or {}
        self.literals = {k[len("literal."):]: v for k, v in p.items()
                         if k.startswith("literal.")}
        self.fmap = {k[len("fmap."):]: v for k, v in p.items()
                     if k.startswith("fmap.")}
        self.uprefix = p.get("uprefix", "")
        self.default_field = p.get("defaultField", "")
        self.lowernames = bool(p.get("lowernames", False))
        self.literals_override = bool(p.get("literalsOverride", True))
        self.content_field = p.get("fmap.content", "content")
        self.known_fields = known_fields

    def _name(self, fname: str) -> str | None:
        if self.lowernames:
            fname = "".join(ch.lower() if ch.isalnum() else "_"
                            for ch in fname)
        name = self.fmap.get(fname, fname)
        if self.known_fields is not None and name not in self.known_fields:
            if self.uprefix:
                name = self.uprefix + name
            elif self.default_field:
                name = self.default_field
            else:
                return None
        return name

    def new_document(self, text: str, metadata: dict[str, str]) -> dict:
        """literals FIRST (so literalsOverride can suppress the rest),
        then metadata, then content (SolrContentHandler.java:113-122).
        literalsOverride suppression compares MAPPED output field names
        (ADVICE r5: with lowernames/fmap a metadata field mapping onto a
        literal's field — e.g. 'Content-Type' -> content_type — must be
        suppressed too, as the reference suppresses by the Solr field)."""
        doc: dict[str, object] = {}
        literal_names = set()
        for fname, val in self.literals.items():
            name = self._name(fname)
            if name is not None:
                literal_names.add(name)
                doc.setdefault(name, []).append(val)
        for fname, val in metadata.items():
            name = self._name(fname)
            if name is None:
                continue
            if self.literals_override and name in literal_names:
                continue
            doc.setdefault(name, []).append(val)
        name = self._name("content")
        if name is not None and not (self.literals_override
                                     and name in literal_names):
            doc.setdefault(name, []).append(text)
        return {k: (v[0] if len(v) == 1 else v) for k, v in doc.items()}


def extract_df(df: DataFrame, content_col: str = "content",
               id_col: str = "media_id") -> DataFrame:
    """One narrow Arrow map: binary column -> (content_type, content
    text, metadata map)."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ])

    def _extract(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            ids = tbl.column(id_col).to_pylist()
            blobs = tbl.column(content_col).to_pylist()
            ctypes, texts, metas = [], [], []
            for blob in blobs:
                ct, tx, md = extract_content(blob or b"")
                ctypes.append(ct)
                texts.append(tx)
                metas.append(md)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(ctypes, pa.string()),
                 pa.array(texts, pa.string()),
                 pa.array(metas, pa.map_(pa.string(), pa.string()))],
                names=[id_col, "content_type", "content", "metadata"])

    sel = df.select(F.col(id_col).cast("long").alias(id_col),
                    F.col(content_col))
    return sel.mapInArrow(_extract, schema)
