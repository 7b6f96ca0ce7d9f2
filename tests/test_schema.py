"""IndexSchema analog: dynamic-field globs, copyField with maxChars,
keyword (string) fields, and a schema-driven multi-field index build.

ref: solr/core/src/java/org/apache/solr/schema/IndexSchema.java:77,
     CopyField.java:25.
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_1_spark.solr.schema import (
    CopyField, IndexSchema, SchemaField, _glob_match)


@pytest.fixture(scope="module")
def schema():
    return IndexSchema(
        fields=[SchemaField("title"), SchemaField("body"),
                SchemaField("catchall"),
                SchemaField("sku", type="string")],
        dynamic=[("*_txt", SchemaField("_", type="text")),
                 ("*_s", SchemaField("_", type="string")),
                 ("attr_*", SchemaField("_", type="text"))],
        copy_fields=[CopyField("title", "catchall"),
                     CopyField("body", "catchall", max_chars=20),
                     CopyField("*_txt", "catchall")])


def test_glob_match():
    assert _glob_match("*_txt", "note_txt")
    assert _glob_match("attr_*", "attr_color")
    assert not _glob_match("*_txt", "txt_note")
    assert _glob_match("title", "title")


def test_resolution_order(schema):
    # exact beats dynamic; longest glob wins; unknown -> None
    assert schema.resolve("title").type == "text"
    assert schema.resolve("color_s").type == "string"
    assert schema.resolve("note_txt").type == "text"
    assert schema.resolve("nope") is None


def test_apply_copyfield_and_keyword(spark, schema):
    df = spark.createDataFrame(
        [("u1", "Big Table", "hash join beats loop join every time",
          "extra words here", "ABC 123")],
        "url string, title string, body string, note_txt string, sku string")
    out, names = schema.apply(df)
    assert set(names) == {"title", "body", "note_txt", "sku", "catchall"}
    row = out.collect()[0]
    assert row["url"] == "u1"                       # id column carried
    # copyField: title + first 20 chars of body + note_txt, space-joined
    assert row["catchall"] == "Big Table hash join beats loop extra words here"
    # keyword field: lowercased single token
    assert row["sku"] == "abc_123"


def test_copy_sources_order(schema):
    names = ["url", "title", "body", "note_txt"]
    assert schema.copy_sources("catchall", names) == \
        ["title", "body", "note_txt"]


def test_unknown_copy_dest_raises(spark):
    s = IndexSchema(fields=[SchemaField("a")],
                    copy_fields=[CopyField("a", "nope")])
    with pytest.raises(ValueError, match="copyField dest"):
        s.apply(spark.createDataFrame([("x",)], "a string"))


def test_schema_driven_build_and_search(spark, tmp_path):
    """End-to-end: schema projection -> build_index(fields=...) ->
    per-field search hits the copyField destination."""
    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.search.engine import IndexSearcher

    schema = IndexSchema(
        fields=[SchemaField("title"), SchemaField("body"),
                SchemaField("catchall")],
        copy_fields=[CopyField("title", "catchall"),
                     CopyField("body", "catchall")])
    rows = [(f"u{i}",
             "zebra headline" if i % 3 == 0 else "plain headline",
             f"body words number{i} " + ("quagga " * (i % 5)))
            for i in range(30)]
    df = spark.createDataFrame(rows, "url string, title string, body string")
    out, names = schema.apply(df)
    paths = build_index(spark, out, str(tmp_path / "idx"),
                        num_segments=4, out_partitions=4, fields=names)
    s = IndexSearcher(spark, paths.root)
    # term only in titles is findable via the catchall copy
    hits = s.search([s.term_key("catchall", "zebra")], k=30).collect()
    assert len(hits) == 10          # i % 3 == 0
    # and via its own field
    hits_t = s.search([s.term_key("title", "zebra")], k=30).collect()
    assert {h["docid"] for h in hits} == {h["docid"] for h in hits_t}
    # term only in bodies reaches catchall too
    assert len(s.search([s.term_key("catchall", "quagga")],
                        k=30).collect()) > 0


def test_date_math_reference_vectors():
    """DateMathParserTest.testParseMath vectors (round, add, subtract,
    compose, month-clamp trickies) + DateField.parseMath literals."""
    from datetime import datetime, timezone

    from lucene_solr_1_spark.solr.datemath import (parse_date_math,
                                                   parse_math)

    def fmt(d):
        return d.strftime("%Y-%m-%dT%H:%M:%S.") \
            + f"{d.microsecond // 1000:03d}"

    now = datetime(2001, 7, 4, 12, 8, 56, 235000, tzinfo=timezone.utc)
    cases = {
        "": "2001-07-04T12:08:56.235",
        "/SECOND": "2001-07-04T12:08:56.000",
        "/MINUTE": "2001-07-04T12:08:00.000",
        "/HOUR": "2001-07-04T12:00:00.000",
        "/DAY": "2001-07-04T00:00:00.000",
        "/MONTH": "2001-07-01T00:00:00.000",
        "/YEAR": "2001-01-01T00:00:00.000",
        "+1MILLISECOND": "2001-07-04T12:08:56.236",
        "-1SECOND": "2001-07-04T12:08:55.235",
        "+1MONTH": "2001-08-04T12:08:56.235",
        "-1YEAR": "2000-07-04T12:08:56.235",
        "+1MILLISECOND-1YEAR": "2000-07-04T12:08:56.236",
        "-1YEAR+1MILLISECOND/MONTH": "2000-07-01T00:00:00.000",
        "-1YEAR+1HOUR/HOUR": "2000-07-04T13:00:00.000",
    }
    for math, exp in cases.items():
        assert fmt(parse_math(math, now)) == exp, math
    tricky_now = datetime(2006, 1, 31, 17, 9, 59, 999000,
                          tzinfo=timezone.utc)
    tricky = {
        "+1MONTH": "2006-02-28T17:09:59.999",
        "+25MONTH": "2008-02-29T17:09:59.999",
        "/MONTH+35DAYS/MONTH": "2006-02-01T00:00:00.000",
        "+3MILLIS/MINUTE": "2006-01-31T17:10:00.000",
    }
    for math, exp in tricky.items():
        assert fmt(parse_math(math, tricky_now)) == exp, math
    assert parse_date_math("2024-01-10T05:06:07Z/DAY+5DAYS") == \
        datetime(2024, 1, 15, tzinfo=timezone.utc)
    assert parse_date_math("NOW/DAY", now=now) == \
        datetime(2001, 7, 4, tzinfo=timezone.utc)
    with pytest.raises(ValueError):
        parse_math("/FORTNIGHT", now)
    with pytest.raises(ValueError):
        parse_math("+1WEEK", now)       # WEEK deliberately unsupported


def test_schema_aux_field_types(spark, tmp_root):
    """tlong/tdate/latlon declared fields build their trie/spatial
    auxiliary indexes; schema-typed range and bbox probes equal plain
    filters; the text projection skips aux fields."""
    import os

    from pyspark.sql import functions as SF

    from lucene_solr_1_spark.solr.schema import (
        IndexSchema, SchemaField, aux_fields, build_aux_indexes,
        schema_bbox_docids, schema_range_docids)

    df = spark.range(200).select(
        SF.col("id").alias("docid"),
        (SF.col("id") * 37 % 1000).alias("price"),
        (SF.lit("2024-01-01T00:00:00Z").cast("timestamp")
         + SF.make_interval(hours=SF.col("id") * 7)).alias("created"),
        SF.format_string("%.4f,%.4f",
                         (SF.col("id") % 160).cast("double") - 80.0,
                         ((SF.col("id") * 3) % 340).cast("double")
                         - 170.0).alias("loc"),
        SF.lit("some text").alias("body"))
    schema = IndexSchema([
        SchemaField("body", type="text"),
        SchemaField("price", type="tlong"),
        SchemaField("created", type="tdate"),
        SchemaField("loc", type="latlon")])
    assert {f.name for f in aux_fields(schema)} == \
        {"price", "created", "loc"}
    projected, names = schema.apply(df)
    assert names == ["body"]            # aux fields stay out of the
    assert "price" in projected.columns  # text index but are carried

    root = os.path.join(tmp_root, "aux_idx")
    paths = build_aux_indexes(spark, df, schema, root, id_col="docid")
    assert set(paths) == {"price", "created", "loc"}

    got = sorted(r["docid"] for r in schema_range_docids(
        spark, schema, paths, "price", 100, 300).collect())
    exp = sorted(r["docid"] for r in
                 df.filter(SF.col("price").between(100, 300))
                 .select("docid").collect())
    assert got == exp and len(got) > 0

    got = sorted(r["docid"] for r in schema_range_docids(
        spark, schema, paths, "created",
        "2024-01-03T09:00:00Z/DAY", "2024-01-03T09:00:00Z/DAY+2DAYS-1MILLI"
    ).collect())
    exp = sorted(r["docid"] for r in df.filter(
        (SF.col("created") >= "2024-01-03 00:00:00")
        & (SF.col("created") < "2024-01-05 00:00:00"))
        .select("docid").collect())
    assert got == exp and len(got) > 0

    got = sorted(r["docid"] for r in schema_bbox_docids(
        spark, schema, paths, "loc", -30.0, 10.0, -50.0, 40.0).collect())
    lat = SF.split("loc", ",").getItem(0).cast("double")
    lon = SF.split("loc", ",").getItem(1).cast("double")
    exp = sorted(r["docid"] for r in df.filter(
        lat.between(-30.0, 10.0) & lon.between(-50.0, 40.0))
        .select("docid").collect())
    assert got == exp and len(got) > 0
    with pytest.raises(ValueError):
        schema_range_docids(spark, schema, paths, "body", 0, 1)


def test_currency_field(spark, tmp_root):
    """CurrencyField analog: value parse, rate conversion (declared +
    inverse fallback), per-currency OR range (CurrencyField.java:40)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from lucene_solr_1_spark.solr.schema import (IndexSchema, SchemaField,
                                                 build_currency_index,
                                                 exchange_rate,
                                                 parse_currency_xml,
                                                 schema_currency_range)
    rates = parse_currency_xml(
        '<currencyConfig version="1.0"><rates>'
        '<rate from="USD" to="EUR" rate="0.5"/></rates></currencyConfig>')
    assert rates == {("USD", "EUR"): 0.5}
    assert exchange_rate(rates, "USD", "EUR") == 0.5
    assert exchange_rate(rates, "EUR", "USD") == 2.0      # inverse fallback
    assert exchange_rate(rates, "USD", "USD") == 1.0
    with pytest.raises(ValueError, match="no exchange rate"):
        exchange_rate(rates, "USD", "JPY")

    df = spark.createDataFrame(
        [(1, "10.00,USD"), (2, "4.00,EUR"), (3, "6.00,EUR"),
         (4, "25.00,USD"), (5, "-3.50,USD")],
        "docid long, price string")
    path = os.path.join(tmp_root, "cur_idx")
    build_currency_index(spark, df, "price", path)
    schema = IndexSchema([SchemaField("price", type="currency")])
    # [8, 20] USD = [4, 10] EUR at 0.5: hits 1 (10 USD), 3 (6 EUR)... no:
    # 6 EUR in [4,10] EUR -> hit; 4.00 EUR at boundary -> hit
    got = sorted(r["docid"] for r in schema_currency_range(
        spark, schema, {"price": path}, "price", 8.0, 20.0, "USD",
        rates).collect())
    assert got == [1, 2, 3]


def test_preanalyzed_field(spark, tmp_root):
    """PreAnalyzedField analog: the embedded JSON token stream indexes
    verbatim (no re-analysis) and the stored text is recoverable."""
    import json
    import os

    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.search.engine import IndexSearcher
    from lucene_solr_1_spark.solr.schema import (IndexSchema, SchemaField,
                                                 preanalyzed_stored_expr,
                                                 schema_analyzers)

    def pa(stored, toks):
        return json.dumps({"v": "1", "str": stored,
                           "tokens": [{"t": t, "s": 0, "e": 0, "i": 1}
                                      for t in toks]})

    rows = [("u1", pa("Hello World", ["hello", "world"])),
            ("u2", pa("The Quick", ["quick", "QUICK_raw"])),
            ("u3", pa("empty", []))]
    df = spark.createDataFrame(rows, "url string, text string")
    schema = IndexSchema([SchemaField("text", type="preanalyzed")])
    proj, names = schema.apply(df)
    assert names == ["text"]
    root = os.path.join(tmp_root, "pa_idx")
    build_index(spark, proj, root, num_segments=2,
                analyzers=schema_analyzers(schema))
    s = IndexSearcher(spark, root)
    st = s.term_stats(["hello", "quick", "QUICK_raw", "the"]).set_index("term")
    # tokens are verbatim: no lowercasing, no stop filtering, no analysis
    assert int(st.loc["hello", "df"]) == 1
    assert int(st.loc["QUICK_raw", "df"]) == 1
    assert "the" not in st.index
    stored = {r["url"]: r["s"] for r in
              df.select("url", preanalyzed_stored_expr("text").alias("s"))
              .collect()}
    assert stored == {"u1": "Hello World", "u2": "The Quick", "u3": "empty"}


# ------------------------------------------------------ external file


def test_parse_external_file_last_wins_and_skips(spark, tmp_root):
    """FileFloatSource parse rules (ExternalFileField.java:40): split
    on the LAST '=', unparsable lines skipped, last occurrence wins."""
    import os

    from lucene_solr_1_spark.solr.schema import parse_external_file
    path = os.path.join(tmp_root, "external_rank")
    with open(path, "w") as f:
        f.write("no delimiter here\n")
        f.write("bad=notafloat\n")
        f.write("a=1.5\n")
        f.write("k=eq=2.25\n")          # key contains '=': last wins
        f.write("a=3.75\n")             # later line overrides a=1.5
        f.write("=0.5\n")               # empty key: skipped
    got = {r.key: r.value for r in parse_external_file(spark, path).collect()}
    assert got == {"a": 3.75, "k=eq": 2.25}


def test_file_float_source_defval(spark, tmp_root):
    import os

    from lucene_solr_1_spark.solr.schema import file_float_source
    path = os.path.join(tmp_root, "external_boost")
    with open(path, "w") as f:
        f.write("d0=2.0\nd2=4.0\n")
    docs = spark.createDataFrame(
        [(0, "d0"), (1, "d1"), (2, "d2")], "docid long, k string")
    got = {r.docid: r.value
           for r in file_float_source(spark, docs, path, "k",
                                      defval=-1.0).collect()}
    assert got == {0: 2.0, 1: -1.0, 2: 4.0}


def test_external_file_boost_join(spark, tmp_root):
    """The join-style ValueSource pattern (norm_source precedent):
    boost scored hits by the external value via a left join."""
    import os

    from lucene_solr_1_spark.solr.schema import file_float_source
    path = os.path.join(tmp_root, "external_clicks")
    with open(path, "w") as f:
        f.write("u7=10.0\n")
    scored = spark.createDataFrame(
        [(7, "u7", 1.0), (8, "u8", 2.0)], "docid long, k string, score double")
    src = file_float_source(spark, scored, path, "k", defval=1.0)
    boosted = (scored.join(src, "docid")
               .select("docid", (F.col("score") * F.col("value"))
                       .alias("score")))
    got = {r.docid: r.score for r in boosted.collect()}
    assert got == {7: 10.0, 8: 2.0}
