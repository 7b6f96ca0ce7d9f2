"""Solr IndexSchema analog: declared field types, dynamic-field globs,
and copyField directives driving the multi-field index build.

ref: solr/core/src/java/org/apache/solr/schema/IndexSchema.java:77
     (dynamic-field resolution), CopyField.java:25 (maxChars
     truncation), FieldType.java (analyzed vs keyword string types).

The reference resolves a document's concrete fields against the schema
at ingest: exact names win, then the longest matching dynamic glob
(``*_txt``, ``attr_*``); copyField directives append the SOURCE's raw
(pre-analysis) value to the destination field, truncated to maxChars,
before the destination's own analyzer runs.  This module reproduces
that resolution as a pure DataFrame-to-DataFrame projection so the
result feeds ``build_index(fields=...)`` unchanged.

Scale: ``apply`` emits only JVM-side column expressions (concat_ws /
substring / lower) — no Python workers, no shuffle; schema resolution
cost at 100 TB is zero beyond the projection itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SchemaField:
    """A declared field. type 'text' is analyzed by the standard chain;
    'string' is a keyword field (whole value, lowercased, one token —
    StrField vs TextField in the reference)."""
    name: str
    type: str = "text"            # 'text' | 'string'
    indexed: bool = True
    stored: bool = True


@dataclass(frozen=True)
class CopyField:
    """copyField source->dest. source may be an exact name or a glob
    with one '*' (prefix or suffix). maxChars truncates the raw copied
    value (CopyField.java:25 getLimitedValue)."""
    source: str
    dest: str
    max_chars: int | None = None


def _glob_match(pattern: str, name: str) -> bool:
    if "*" not in pattern:
        return pattern == name
    if pattern.startswith("*"):
        return name.endswith(pattern[1:])
    if pattern.endswith("*"):
        return name.startswith(pattern[:-1])
    raise ValueError(f"dynamic pattern must have '*' at an end: {pattern}")


class IndexSchema:
    """fields: declared exact fields.  dynamic: (glob, SchemaField
    template) pairs — the template's name is ignored; resolution follows
    the reference's rule (exact name first, then longest glob)."""

    def __init__(self, fields: list[SchemaField],
                 dynamic: list[tuple[str, SchemaField]] = (),
                 copy_fields: list[CopyField] = ()):
        self.fields = {f.name: f for f in fields}
        # longest glob wins, as IndexSchema sorts dynamic fields
        self.dynamic = sorted(dynamic, key=lambda p: -len(p[0]))
        self.copy_fields = list(copy_fields)

    # ------------------------------------------------------ resolution

    def resolve(self, name: str) -> SchemaField | None:
        """Schema entry for a concrete field name, or None if the
        schema does not admit it (unknown field -> reference throws)."""
        if name in self.fields:
            return self.fields[name]
        for pat, tmpl in self.dynamic:
            if _glob_match(pat, name):
                return SchemaField(name=name, type=tmpl.type,
                                   indexed=tmpl.indexed, stored=tmpl.stored)
        return None

    def copy_sources(self, dest: str, names: list[str]) -> list[str]:
        """Concrete source columns that copy into `dest`, in directive
        order (glob sources expand in column order)."""
        out: list[str] = []
        for cf in self.copy_fields:
            if cf.dest != dest:
                continue
            for n in names:
                if _glob_match(cf.source, n) and n != dest:
                    out.append(n)
        return out

    # ---------------------------------------------------------- apply

    def apply(self, df: DataFrame) -> tuple[DataFrame, list[str]]:
        """Project `df` to one string column per indexed schema field:

        * every input column the schema resolves keeps its (string-cast)
          value;
        * copyField destinations get source values appended in directive
          order, each truncated to max_chars, space-joined (the
          positional-gap concatenation of a multiValued destination);
        * 'string' (keyword) fields are lowercased whole values — the
          build tokenizes on whitespace, so internal spaces are bound
          with '_' to keep the single-token invariant (documented
          divergence: StrField is verbatim; ours is a lowercase
          keyword).

        Returns (projected_df, indexed_field_names) ready for
        ``build_index(spark, projected_df, root, fields=names)``.
        """
        in_cols = list(df.columns)
        resolved = {n: self.resolve(n) for n in in_cols}
        dests = {cf.dest for cf in self.copy_fields}
        for d in dests:
            if self.resolve(d) is None:
                raise ValueError(f"copyField dest not in schema: {d}")

        out_cols: dict[str, F.Column] = {}
        names: list[str] = []
        # carry non-field identifier columns (url, ids) through untouched
        for n in in_cols:
            if resolved[n] is None:
                out_cols[n] = F.col(n)
        for n in in_cols:
            sf = resolved[n]
            if sf is None or not sf.indexed:
                continue
            if sf.type == _PREANALYZED_TYPE:
                # PreAnalyzedField: the raw JSON rides through; the
                # build tokenizes it via schema_analyzers(...)
                out_cols[n] = F.col(n)
                names.append(n)
                continue
            if sf.type not in ("text", "string"):
                # trie/date/latlon/currency fields index through
                # build_aux_indexes, not the inverted text index;
                # carry the raw column
                out_cols[n] = F.col(n)
                continue
            out_cols[n] = self._render(F.col(n).cast("string"), sf)
            names.append(n)
        for d in sorted(dests):
            sf = self.resolve(d)
            if not sf.indexed:
                continue
            parts = []
            if d in in_cols:                 # own content first
                parts.append(F.col(d).cast("string"))
            for cf in self.copy_fields:
                if cf.dest != d:
                    continue
                for n in in_cols:
                    if _glob_match(cf.source, n) and n != d:
                        c = F.col(n).cast("string")
                        if cf.max_chars is not None:
                            c = F.substring(c, 1, cf.max_chars)
                        parts.append(c)
            col = parts[0] if len(parts) == 1 else F.concat_ws(" ", *parts)
            out_cols[d] = self._render(col, sf)
            if d not in names:
                names.append(d)
        return df.select([out_cols[c].alias(c) for c in out_cols]), names

    @staticmethod
    def _render(col: F.Column, sf: SchemaField) -> F.Column:
        if sf.type == "string":
            return F.regexp_replace(F.lower(F.trim(col)), r"\s+", "_")
        return col


# --------------------------------------------------- non-text FieldTypes
#
# The reference's FieldType plugin set (solr/core/src/java/org/apache/
# solr/schema/: TrieIntField/TrieLongField, TrieDateField with Solr
# date math, LatLonType) beyond text/string. These fields don't enter
# the inverted text index; each declared field gets its own auxiliary
# index — the trie-term parquet (index/numeric.py) or the quad-tree
# spatial parquet (search/spatial.py) — built once and range/bbox-
# probed with term-range predicates pushed into the scan.

_NUMERIC_TYPES = ("tint", "tlong")      # TrieIntField / TrieLongField
_DATE_TYPE = "tdate"                    # TrieDateField (epoch millis)
_LATLON_TYPE = "latlon"                 # LatLonType ("lat,lon" string)
_CURRENCY_TYPE = "currency"             # CurrencyField ("amount,CUR")
_PREANALYZED_TYPE = "preanalyzed"       # PreAnalyzedField (JSON tokens)


def aux_fields(schema: "IndexSchema") -> list[SchemaField]:
    return [f for f in schema.fields.values()
            if f.indexed and f.type in
            _NUMERIC_TYPES + (_DATE_TYPE, _LATLON_TYPE)]


def build_aux_indexes(spark, df: DataFrame, schema: "IndexSchema",
                      root: str, id_col: str = "docid",
                      out_partitions: int = 8) -> dict[str, str]:
    """One auxiliary index per declared trie/date/latlon field:
    root/<field>/ parquet. Date columns become epoch millis
    (TrieDateField stores the date as a long); latlon columns may be a
    "lat,lon" string (LatLonType's stored form) or a struct with
    lat/lon fields."""
    import os

    from ..index.numeric import build_numeric_index
    from ..search.spatial import build_spatial_index
    paths: dict[str, str] = {}
    for f in aux_fields(schema):
        path = os.path.join(root, f.name)
        if f.type in _NUMERIC_TYPES:
            src = df.select(id_col, F.col(f.name).cast("long")
                            .alias(f.name))
            build_numeric_index(spark, src, f.name, path, id_col=id_col,
                                out_partitions=out_partitions)
        elif f.type == _DATE_TYPE:
            src = df.select(
                id_col,
                (F.col(f.name).cast("timestamp").cast("double") * 1000)
                .cast("long").alias(f.name))
            build_numeric_index(spark, src, f.name, path, id_col=id_col,
                                out_partitions=out_partitions)
        else:                            # latlon
            c = F.col(f.name)
            if dict(df.dtypes)[f.name].startswith("string"):
                lat = F.split(c, ",").getItem(0).cast("double")
                lon = F.split(c, ",").getItem(1).cast("double")
            else:
                lat, lon = c["lat"].cast("double"), c["lon"].cast("double")
            src = df.select(id_col, lat.alias("lat"), lon.alias("lon"))
            build_spatial_index(spark, src, "lat", "lon", path,
                                level=9, out_partitions=out_partitions)
        paths[f.name] = path
    return paths


def schema_range_docids(spark, schema: "IndexSchema",
                        aux_paths: dict[str, str], field: str,
                        lo, hi, now=None) -> DataFrame:
    """Schema-typed range query [lo, hi] over a declared trie field.
    tdate bounds accept Solr date-math strings
    ("2024-01-10T00:00:00Z/DAY+5DAYS-1MILLI", "NOW/DAY") resolved
    through DateMathParser semantics; numeric fields take ints."""
    from ..index.numeric import numeric_range_docids
    sf = schema.fields.get(field)
    if sf is None or sf.type not in _NUMERIC_TYPES + (_DATE_TYPE,):
        raise ValueError(f"not a declared trie field: {field}")
    if sf.type == _DATE_TYPE:
        from .datemath import epoch_millis, parse_date_math
        lo = epoch_millis(parse_date_math(lo, now=now)) \
            if isinstance(lo, str) else int(lo)
        hi = epoch_millis(parse_date_math(hi, now=now)) \
            if isinstance(hi, str) else int(hi)
    return numeric_range_docids(spark, aux_paths[field], int(lo), int(hi))


def schema_bbox_docids(spark, schema: "IndexSchema",
                       aux_paths: dict[str, str], field: str,
                       lat_min: float, lat_max: float,
                       lon_min: float, lon_max: float) -> DataFrame:
    """Schema-typed bbox query over a declared latlon field."""
    from ..search.spatial import geo_bbox_search
    sf = schema.fields.get(field)
    if sf is None or sf.type != _LATLON_TYPE:
        raise ValueError(f"not a declared latlon field: {field}")
    return geo_bbox_search(spark, aux_paths[field], lat_min, lat_max,
                           lon_min, lon_max, level=9)


# ------------------------------------------------------- CurrencyField
#
# ref: solr/core/src/java/org/apache/solr/schema/CurrencyField.java:40:
# a "amount,CUR" value indexes two subfields — the amount in MINOR
# units (long, its own currency) and the currency code; a range query
# in currency C executes as the OR over every known currency of
# (code = cur AND amount BETWEEN convert(lo, C->cur), convert(hi,
# C->cur)) with rates from currency.xml (FileExchangeRateProvider).


def parse_currency_xml(xml: str) -> dict[tuple[str, str], float]:
    """currency.xml -> {(from, to): rate} (FileExchangeRateProvider's
    <rate from=".." to=".." rate=".."/> entries)."""
    import xml.etree.ElementTree as ET
    if "<!DOCTYPE" in xml or "<!ENTITY" in xml:
        raise ValueError("DTD not allowed in currency.xml")
    root = ET.fromstring(xml)
    out: dict[tuple[str, str], float] = {}
    for r in root.iter("rate"):
        out[(r.get("from"), r.get("to"))] = float(r.get("rate"))
    return out


def exchange_rate(rates: dict[tuple[str, str], float],
                  src: str, dst: str) -> float:
    """Rate src->dst: identity, the declared rate, or the declared
    inverse (FileExchangeRateProvider.getExchangeRate fallback)."""
    if src == dst:
        return 1.0
    if (src, dst) in rates:
        return rates[(src, dst)]
    if (dst, src) in rates:
        return 1.0 / rates[(dst, src)]
    raise ValueError(f"no exchange rate {src}->{dst}")


def build_currency_index(spark, df: DataFrame, field: str, path: str,
                         id_col: str = "docid",
                         out_partitions: int = 4) -> None:
    """Aux index for a declared currency field: (docid, currency,
    amount minor units), partitioned by currency so a range query scans
    only the currencies it matches."""
    c = F.col(field).cast("string")
    amount = F.round(F.split(c, ",").getItem(0).cast("double") * 100) \
        .cast("long")
    cur = F.upper(F.trim(F.split(c, ",").getItem(1)))
    (df.select(id_col, amount.alias("amount"), cur.alias("currency"))
     .repartition(out_partitions, "currency")
     .sortWithinPartitions("currency", "amount")
     .write.mode("overwrite").parquet(path))


def schema_currency_range(spark, schema: "IndexSchema",
                          aux_paths: dict[str, str], field: str,
                          lo: float, hi: float, currency: str,
                          rates: dict[tuple[str, str], float]) -> DataFrame:
    """CurrencyField range query: bounds in `currency` converted to
    every known currency, OR-composed (CurrencyField.java:40
    getRangeQuery). Returns DataFrame(docid)."""
    sf = schema.fields.get(field)
    if sf is None or sf.type != _CURRENCY_TYPE:
        raise ValueError(f"not a declared currency field: {field}")
    knowns = sorted({c for pair in rates for c in pair} | {currency})
    pred = None
    for cur in knowns:
        r = exchange_rate(rates, currency, cur)
        p = ((F.col("currency") == cur)
             & F.col("amount").between(int(round(lo * 100 * r)),
                                       int(round(hi * 100 * r))))
        pred = p if pred is None else (pred | p)
    return (spark.read.parquet(aux_paths[field])
            .filter(pred).select("docid"))


# ---------------------------------------------------- PreAnalyzedField
#
# ref: solr/core/src/java/org/apache/solr/schema/PreAnalyzedField.java
# + JsonPreAnalyzedParser: the field VALUE carries its own token stream
# as JSON — {"v":"1","str":"<stored text>","tokens":[{"t":"tok",
# "s":start,"e":end,"i":posIncr}, ...]} — indexed verbatim with no
# analyzer. Here the JSON parses JVM-side (from_json) into the token
# array build_index consumes through analyzers={field: ...}.

_PREANALYZED_JSON_SCHEMA = ("struct<v:string,str:string,"
                            "tokens:array<struct<t:string,s:bigint,"
                            "e:bigint,i:bigint>>>")


def preanalyzed_tokens_expr(col) -> F.Column:
    """string JSON column -> array<string> of the tokens, verbatim
    (position increments collapse to stream order — the inverted index
    stores sequence positions, as the standard chain does)."""
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, _PREANALYZED_JSON_SCHEMA)
    return F.coalesce(
        F.transform(parsed["tokens"], lambda t: t["t"]),
        F.array().cast("array<string>"))


def preanalyzed_stored_expr(col) -> F.Column:
    """The stored value ("str") of a pre-analyzed JSON field."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, _PREANALYZED_JSON_SCHEMA)["str"]


def schema_analyzers(schema: "IndexSchema") -> dict:
    """analyzers= dict for build_index: every declared preanalyzed
    field tokenizes through its embedded JSON token stream."""
    return {f.name: preanalyzed_tokens_expr
            for f in schema.fields.values()
            if f.indexed and f.type == _PREANALYZED_TYPE}


# --------------------------------------------------------------------
# ExternalFileField (ref solr/core/.../schema/ExternalFileField.java:40
# + search/function/FileFloatSource.java): per-doc floats that live in
# an external_<field> text file of 'key=value' lines instead of the
# index — rank signals (click counts, pagerank) updated without
# reindexing. Not searchable/storable; usable only as a function-query
# ValueSource. FileFloatSource parses on the LAST '=' (keys may contain
# '='), skips unparsable lines, and lets the LAST occurrence of a key
# win; missing keys take defVal.

_EXTERNAL_TYPE = "external"


def parse_external_file(spark, path: str) -> DataFrame:
    """external_<field> file -> DataFrame(key string, value float),
    last-occurrence-wins. Distributed parse (spark.read.text): a
    rank-signal file for 10^12 docs never funnels through the driver.
    File order is recovered via monotonically_increasing_id, which is
    monotone in (split, row-in-split) order for an ordered text read —
    the same total order the reference's sequential parse sees."""
    lines = (spark.read.text(path)
             .withColumn("_ord", F.monotonically_increasing_id()))
    # split on the LAST '=': key = everything before it
    eq = F.length("value") - F.locate("=", F.reverse("value")) + 1
    parsed = (lines.filter(F.col("value").contains("="))
              .select(F.substring("value", F.lit(1), eq - 1).alias("key"),
                      F.substring("value", eq + 1, F.lit(1 << 30))
                      .try_cast("float").alias("val"),   # skip bad floats
                      "_ord")
              .filter(F.col("val").isNotNull() & (F.col("key") != "")))
    return (parsed.groupBy("key")
            .agg(F.max_by("val", "_ord").alias("value")))


def file_float_source(spark, docs: DataFrame, path: str, key_field: str,
                      defval: float = 0.0) -> DataFrame:
    """FileFloatSource: DataFrame(docid, value float) joining the
    external file against the docs table's key field (uniqueKey in the
    reference). Join-style per-doc source, the norm_source pattern —
    left join + defVal coalesce; no broadcast forced (the file may be
    index-sized; AQE picks the strategy)."""
    kv = parse_external_file(spark, path)
    keyed = docs.select("docid",
                        F.col(key_field).cast("string").alias("key"))
    return (keyed.join(kv, "key", "left")
            .select("docid",
                    F.coalesce("value",
                               F.lit(float(defval))).alias("value")))
