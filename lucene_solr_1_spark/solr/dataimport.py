"""DataImportHandler-lite — config-driven import as Catalyst plans.

Reference: ``solr/contrib/dataimporthandler/src/java/org/apache/solr/
handler/dataimport/`` — ``data-config.xml`` describes a document as a
tree of entities (processor + source + fields + transformers);
``RegexTransformer.java:46-175`` (regex single-group extract,
multi-group list, groupNames map, splitBy, replaceWith-on-find),
``TemplateTransformer.java`` (``${entity.col}`` splicing, row skipped
for a missing variable), ``DateFormatTransformer.java`` (pattern
parse), ``LineEntityProcessor.java`` (one row per line, column
``rawLine``), ``XPathEntityProcessor.java`` (forEach row split +
per-field xpath), and the cached child-entity pattern
(``CachedSqlEntityProcessor``: child keyed by ``cacheKey``, looked up
with ``cacheLookup="parent.col"``).

The Spark twin compiles the SAME config grammar into one declarative
plan — every transformer is a JVM expression (``regexp_extract`` /
``split`` / ``regexp_replace`` / ``concat`` / ``to_timestamp``, all
whole-stage codegen), and the reference's N+1 child-entity queries
become ONE join + ``collect_list`` aggregation (broadcast when the
child is small).  XPath rows are split with ElementTree inside one
Arrow batch map (the only Python step, and only for XML sources).

Supported subset (documented): processors LineEntityProcessor /
XPathEntityProcessor (absolute ``forEach``-relative field paths and
``@attr``), transformers Regex/Template/DateFormat, one level of
child entities via cacheKey/cacheLookup.  SQL datasources are out of
scope (no JDBC in this engine); point the entity ``url`` at files.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["parse_data_config", "run_import"]

_VAR_RE = re.compile(r"\$\{([\w.]+)\}")


def parse_data_config(xml_text: str) -> dict:
    """data-config.xml -> {"entities": [entity dicts]} (root entities
    with nested "children")."""
    root = ET.fromstring(xml_text)
    doc = root.find("document")
    if doc is None:
        raise ValueError("data-config has no <document>")

    def parse_entity(el) -> dict:
        ent = {
            "name": el.get("name"),
            "processor": el.get("processor", "LineEntityProcessor"),
            "url": el.get("url"),
            "forEach": el.get("forEach"),
            "cacheKey": el.get("cacheKey"),
            "cacheLookup": el.get("cacheLookup"),
            "transformers": [t.strip() for t in
                             (el.get("transformer") or "").split(",")
                             if t.strip()],
            "fields": [dict(f.attrib) for f in el.findall("field")],
            "children": [parse_entity(c) for c in el.findall("entity")],
        }
        return ent

    return {"entities": [parse_entity(e) for e in doc.findall("entity")]}


def _read_entity_rows(spark: SparkSession, ent: dict,
                      base_dir: str) -> DataFrame:
    """Entity processor: source rows before transformers."""
    url = os.path.join(base_dir, ent["url"]) if ent.get("url") else None
    proc = ent["processor"]
    if proc == "LineEntityProcessor":
        # one row per non-empty line, column rawLine
        return (spark.read.text(url)
                .withColumnRenamed("value", "rawLine")
                .filter(F.col("rawLine") != ""))
    if proc == "XPathEntityProcessor":
        for_each = ent["forEach"]
        fields = [(f["column"], f.get("xpath")) for f in ent["fields"]
                  if f.get("xpath")]
        whole = spark.read.text(url, wholetext=True)

        def _split(pdfs):
            for pdf in pdfs:
                rows = {c: [] for c, _ in fields}
                for blob in pdf["value"]:
                    tree = ET.fromstring(blob)
                    # forEach like /root/item: iterate matching elements
                    steps = [s for s in for_each.split("/") if s]
                    if tree.tag != steps[0]:
                        continue
                    ctx = [tree]
                    for s in steps[1:]:
                        ctx = [m for e in ctx for m in e.findall(s)]
                    for node in ctx:
                        for col, xp in fields:
                            rel = xp
                            if xp.startswith(for_each):
                                rel = xp[len(for_each):].lstrip("/")
                            if rel.startswith("@"):
                                rows[col].append(node.get(rel[1:]))
                            else:
                                sub = node.find(rel) if rel else node
                                rows[col].append(
                                    None if sub is None else
                                    (sub.text or ""))
                import pandas as pd
                yield pd.DataFrame(rows)

        schema = ", ".join(f"`{c}` string" for c, _ in fields)
        return whole.mapInPandas(_split, schema)
    raise ValueError(f"unsupported processor: {proc}")


def _apply_transformers(df: DataFrame, ent: dict) -> DataFrame:
    """Field declarations -> JVM column expressions, applied in the
    entity's DECLARED transformer-attribute order (DIH instantiates
    and runs them left to right)."""
    appliers = {"RegexTransformer": _apply_regex,
                "TemplateTransformer": _apply_template,
                "DateFormatTransformer": _apply_dateformat}
    for t in ent["transformers"]:
        fn = appliers.get(t)
        if fn is None:
            raise ValueError(f"unsupported transformer: {t}")
        df = fn(df, ent)
    return df


def _apply_regex(df: DataFrame, ent: dict) -> DataFrame:
    for f in ent["fields"]:
            col, regex = f["column"], f.get("regex")
            split_by, replace = f.get("splitBy"), f.get("replaceWith")
            src = f.get("sourceColName", col)
            if split_by is not None:
                # Java String.split drops TRAILING empty strings (inner
                # empties are kept): trim trailing separators off the
                # string first; an all-separator value splits to []
                trimmed = F.regexp_replace(F.col(src),
                                           f"(?:{split_by})+$", "")
                df = df.withColumn(
                    col,
                    F.when((trimmed == "") & (F.col(src) != ""),
                           F.array().cast("array<string>"))
                    .otherwise(F.split(trimmed, split_by)))
            elif replace is not None and regex is not None:
                # m.find() ? replaceAll : null (original value kept
                # when col == sourceColName)
                base = F.col(src)
                out = F.when(base.rlike(regex),
                             F.regexp_replace(base, regex, replace))
                df = df.withColumn(col, out.otherwise(base) if src == col
                                   else out)
            elif regex is not None:
                groups = f.get("groupNames")
                if groups:
                    names = [g.strip() for g in groups.split(",")]
                    for i, gname in enumerate(names, start=1):
                        if gname:
                            df = df.withColumn(
                                gname, F.regexp_extract(F.col(src),
                                                        regex, i))
                else:
                    df = df.withColumn(
                        col, F.regexp_extract(F.col(src), regex, 1))
    return df


def _apply_template(df: DataFrame, ent: dict) -> DataFrame:
    name = ent["name"]
    for f in ent["fields"]:
        tmpl = f.get("template")
        if not tmpl:
            continue
        parts, last = [], 0
        for m in _VAR_RE.finditer(tmpl):
            if m.start() > last:
                parts.append(F.lit(tmpl[last:m.start()]))
            var = m.group(1)
            col = var.split(".", 1)[1] if var.startswith(name + ".") \
                else var
            parts.append(F.col(col))
            last = m.end()
        if last < len(tmpl):
            parts.append(F.lit(tmpl[last:]))
        df = df.withColumn(f["column"], F.concat(*parts))
    return df


def _apply_dateformat(df: DataFrame, ent: dict) -> DataFrame:
    for f in ent["fields"]:
        fmt = f.get("dateTimeFormat")
        if fmt:
            src = f.get("sourceColName", f["column"])
            df = df.withColumn(f["column"],
                               F.to_timestamp(F.col(src), fmt))
    return df


def _entity_df(spark: SparkSession, ent: dict, base_dir: str) -> DataFrame:
    df = _apply_transformers(_read_entity_rows(spark, ent, base_dir), ent)
    for child in ent["children"]:
        cdf = _entity_df(spark, child, base_dir)
        key, lookup = child["cacheKey"], child["cacheLookup"]
        if not key or not lookup:
            raise ValueError(
                f"child entity {child['name']!r} needs cacheKey/cacheLookup")
        parent_col = lookup.split(".", 1)[1]
        # only the child's DECLARED fields flow onto the document (the
        # processor's internal rawLine does not), which also keeps the
        # join free of name collisions with the parent
        declared = []
        for f in child["fields"]:
            declared.append(f["column"])
            for g in (f.get("groupNames") or "").split(","):
                if g.strip():
                    declared.append(g.strip())
        child_cols = [c for c in dict.fromkeys(declared)
                      if c != key and c in cdf.columns]
        cdf = cdf.select(key, *child_cols)
        # the reference runs one child query per parent row; here the
        # whole child relation joins once and its columns aggregate to
        # multi-valued fields (Catalyst broadcasts a small child).
        # A synthetic row id keeps DUPLICATE parent rows as separate
        # documents (grouping on the value columns alone would merge
        # them and double their child lists).
        parent_cols = df.columns
        df = df.withColumn("_rowid", F.monotonically_increasing_id())
        joined = (df.join(cdf.withColumnRenamed(key, "_ck"),
                          F.col(parent_col) == F.col("_ck"), "left")
                  .drop("_ck"))
        aggs = [F.collect_list(c).alias(c) for c in child_cols]
        df = (joined.groupBy("_rowid", *parent_cols).agg(*aggs)
              .drop("_rowid"))
    return df


def run_import(spark: SparkSession, config_xml: str,
               base_dir: str) -> DataFrame:
    """Full-import twin: compile the config and return the document
    DataFrame (first root entity; DIH's multi-root configs union)."""
    cfg = parse_data_config(config_xml)
    dfs = [_entity_df(spark, e, base_dir) for e in cfg["entities"]]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
