"""DataImportHandler-lite (solr/dataimport.py).

The regex vectors come from the reference's own TestRegexTransformer
(mileage multi-group + groupNames, template splice chain).
"""

from __future__ import annotations

import os

import pytest

from lucene_solr_1_spark.solr.dataimport import parse_data_config, run_import

MILEAGE = "Fuel Economy Range:  26 mpg Hwy, 19 mpg City"


def test_parse_data_config():
    cfg = parse_data_config("""
<dataConfig><document>
 <entity name="x" processor="LineEntityProcessor" url="f.txt"
         transformer="RegexTransformer,TemplateTransformer">
   <field column="id" regex="^(\\S+)" sourceColName="rawLine"/>
   <entity name="c" url="g.txt" cacheKey="k" cacheLookup="x.id">
     <field column="v" regex="v=(\\d+)" sourceColName="rawLine"/>
   </entity>
 </entity>
</document></dataConfig>""")
    e = cfg["entities"][0]
    assert e["name"] == "x" and e["url"] == "f.txt"
    assert e["transformers"] == ["RegexTransformer", "TemplateTransformer"]
    assert e["fields"][0]["column"] == "id"
    assert e["children"][0]["cacheKey"] == "k"


def test_regex_group_names_and_template(spark, tmp_path):
    # TestRegexTransformer.testMileage: two named groups + a template
    (tmp_path / "cars.txt").write_text(MILEAGE + "\n")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="LineEntityProcessor" url="cars.txt"
         transformer="RegexTransformer,TemplateTransformer">
   <field column="rowdata"
          regex="Fuel Economy Range:\\s*?(\\d+)\\s*?mpg\\s*?Hwy,\\s*?(\\d+)\\s*?mpg\\s*?City"
          groupNames="highway_mileage,city_mileage"
          sourceColName="rawLine"/>
   <field column="t3"
          template="Fuel Economy range: ${e.highway_mileage} mpg Hwy, ${e.city_mileage} mpg City"/>
 </entity>
</document></dataConfig>"""
    row = run_import(spark, cfg, str(tmp_path)).collect()[0]
    assert row["highway_mileage"] == "26"
    assert row["city_mileage"] == "19"
    assert row["t3"] == "Fuel Economy range: 26 mpg Hwy, 19 mpg City"


def test_regex_split_and_replace(spark, tmp_path):
    (tmp_path / "p.txt").write_text("a,b,c|D'souza\n")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="LineEntityProcessor" url="p.txt"
         transformer="RegexTransformer">
   <field column="parts" splitBy="," sourceColName="head"/>
   <field column="head" regex="^([^|]*)" sourceColName="rawLine"/>
   <field column="name" regex="\\|(.*)$" sourceColName="rawLine"/>
   <field column="quoted" regex="'" replaceWith="''"
          sourceColName="name"/>
 </entity>
</document></dataConfig>"""
    # NOTE field order: 'head' is declared after 'parts' but the twin
    # applies declarations in order — reorder so head exists first
    cfg = cfg.replace(
        '<field column="parts" splitBy="," sourceColName="head"/>\n   '
        '<field column="head" regex="^([^|]*)" sourceColName="rawLine"/>',
        '<field column="head" regex="^([^|]*)" sourceColName="rawLine"/>\n   '
        '<field column="parts" splitBy="," sourceColName="head"/>')
    row = run_import(spark, cfg, str(tmp_path)).collect()[0]
    assert row["parts"] == ["a", "b", "c"]
    assert row["quoted"] == "D''souza"  # TestRegexTransformer.testReplaceWith


def test_replace_no_match_keeps_original_inplace(spark, tmp_path):
    (tmp_path / "r.txt").write_text("no apostrophes here\n")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="LineEntityProcessor" url="r.txt"
         transformer="RegexTransformer">
   <field column="rawLine" regex="'" replaceWith="''"/>
 </entity>
</document></dataConfig>"""
    row = run_import(spark, cfg, str(tmp_path)).collect()[0]
    assert row["rawLine"] == "no apostrophes here"


def test_date_format_transformer(spark, tmp_path):
    (tmp_path / "d.txt").write_text("2024-03-05\n")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="LineEntityProcessor" url="d.txt"
         transformer="DateFormatTransformer">
   <field column="ts" dateTimeFormat="yyyy-MM-dd" sourceColName="rawLine"/>
 </entity>
</document></dataConfig>"""
    row = run_import(spark, cfg, str(tmp_path)).collect()[0]
    assert str(row["ts"]).startswith("2024-03-05")


def test_xpath_entity_processor(spark, tmp_path):
    (tmp_path / "x.xml").write_text(
        "<catalog><item id=\"1\"><name>one</name></item>"
        "<item id=\"2\"><name>two</name></item></catalog>")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="XPathEntityProcessor" url="x.xml"
         forEach="/catalog/item">
   <field column="id" xpath="/catalog/item/@id"/>
   <field column="name" xpath="/catalog/item/name"/>
 </entity>
</document></dataConfig>"""
    rows = sorted((r["id"], r["name"]) for r in
                  run_import(spark, cfg, str(tmp_path)).collect())
    assert rows == [("1", "one"), ("2", "two")]


def test_child_entity_join_multivalued(spark, tmp_path):
    (tmp_path / "docs.txt").write_text("d1 en\nd2 de\nd3 en\n")
    (tmp_path / "tags.txt").write_text("en alpha\nen beta\nde gamma\n")
    cfg = """
<dataConfig><document>
 <entity name="doc" processor="LineEntityProcessor" url="docs.txt"
         transformer="RegexTransformer">
   <field column="id" regex="^(\\S+)" sourceColName="rawLine"/>
   <field column="lang" regex="\\s(\\S+)$" sourceColName="rawLine"/>
   <entity name="tag" processor="LineEntityProcessor" url="tags.txt"
           transformer="RegexTransformer"
           cacheKey="code" cacheLookup="doc.lang">
     <field column="code" regex="^(\\S+)" sourceColName="rawLine"/>
     <field column="tag" regex="\\s(\\S+)$" sourceColName="rawLine"/>
   </entity>
 </entity>
</document></dataConfig>"""
    out = {r["id"]: sorted(r["tag"]) for r in
           run_import(spark, cfg, str(tmp_path)).collect()}
    # the reference's per-parent child query becomes one join; child
    # fields land multi-valued on the parent
    assert out["d1"] == ["alpha", "beta"]
    assert out["d2"] == ["gamma"]
    assert out["d3"] == ["alpha", "beta"]


def test_transformer_declared_order(spark, tmp_path):
    # Template FIRST builds a composite, Regex THEN extracts from it —
    # the reference applies transformers in attribute order
    (tmp_path / "o.txt").write_text("abc\n")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="LineEntityProcessor" url="o.txt"
         transformer="TemplateTransformer,RegexTransformer">
   <field column="combo" template="X-${e.rawLine}"/>
   <field column="tail" regex="X-(.*)$" sourceColName="combo"/>
 </entity>
</document></dataConfig>"""
    row = run_import(spark, cfg, str(tmp_path)).collect()[0]
    assert row["combo"] == "X-abc"
    assert row["tail"] == "abc"


def test_split_by_drops_trailing_empties(spark, tmp_path):
    # Java String.split: "a,b,," -> [a, b]; inner empties kept;
    # all-separator value -> []
    (tmp_path / "s.txt").write_text("a,b,,\nx,,y\n,,,\n")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="LineEntityProcessor" url="s.txt"
         transformer="RegexTransformer">
   <field column="parts" splitBy="," sourceColName="rawLine"/>
 </entity>
</document></dataConfig>"""
    got = {r["rawLine"]: r["parts"]
           for r in run_import(spark, cfg, str(tmp_path)).collect()}
    assert got["a,b,,"] == ["a", "b"]
    assert got["x,,y"] == ["x", "", "y"]
    assert got[",,,"] == []


def test_duplicate_parent_rows_stay_separate_docs(spark, tmp_path):
    (tmp_path / "dd.txt").write_text("d1 en\nd1 en\n")
    (tmp_path / "tt.txt").write_text("en alpha\nen beta\n")
    cfg = """
<dataConfig><document>
 <entity name="doc" processor="LineEntityProcessor" url="dd.txt"
         transformer="RegexTransformer">
   <field column="id" regex="^(\\S+)" sourceColName="rawLine"/>
   <field column="lang" regex="\\s(\\S+)$" sourceColName="rawLine"/>
   <entity name="tag" processor="LineEntityProcessor" url="tt.txt"
           transformer="RegexTransformer"
           cacheKey="code" cacheLookup="doc.lang">
     <field column="code" regex="^(\\S+)" sourceColName="rawLine"/>
     <field column="tag" regex="\\s(\\S+)$" sourceColName="rawLine"/>
   </entity>
 </entity>
</document></dataConfig>"""
    rows = run_import(spark, cfg, str(tmp_path)).collect()
    # two identical input lines -> two documents, each with 2 tags
    assert len(rows) == 2
    assert all(sorted(r["tag"]) == ["alpha", "beta"] for r in rows)


def test_group_names_with_empty_slot_skips_group(spark, tmp_path):
    # TestRegexTransformer.testGroupNames: groupNames=",firstName,lastName"
    # — the empty first name means regex group 1 is not emitted
    (tmp_path / "g.txt").write_text("Mr Noble Paul\n")
    cfg = """
<dataConfig><document>
 <entity name="e" processor="LineEntityProcessor" url="g.txt"
         transformer="RegexTransformer">
   <field column="fullName" regex="(\\w*) (\\w*) (\\w*)"
          groupNames=",firstName,lastName" sourceColName="rawLine"/>
 </entity>
</document></dataConfig>"""
    out = run_import(spark, cfg, str(tmp_path))
    row = out.collect()[0]
    assert row["firstName"] == "Noble"
    assert row["lastName"] == "Paul"
    # the skipped (empty-named) group emits nothing under the column name
    assert "fullName" not in out.columns
