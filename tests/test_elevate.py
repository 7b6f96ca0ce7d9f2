"""QueryElevationComponent (solr/elevate.py) + TermVectorComponent
(index/termvectors.py::term_vectors_for_docs, solr/components.py):
elevate.xml parsing, elevation re-rank/insert/exclude semantics vs a
pandas oracle, per-hit term-vector rows vs get_term_vector, handler
wiring."""

import os

import pandas as pd
import pytest

from lucene_solr_1_spark.fixtures.webtext import gen_docs
from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.index.termvectors import (build_term_vectors,
                                                   get_term_vector,
                                                   term_vectors_for_docs)
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.solr.elevate import (analyzed_key, apply_elevation,
                                              elevated_search,
                                              parse_elevate_xml)

N_DOCS = 300


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    docs_pdf = gen_docs(N_DOCS)
    root = os.path.join(tmp_root, "idx_elev")
    paths = build_index(spark, spark.createDataFrame(docs_pdf), root,
                        num_segments=4)
    searcher = IndexSearcher(spark, paths.root)
    tv_path = os.path.join(tmp_root, "tv_elev")
    build_term_vectors(spark, spark.read.parquet(paths.docs), tv_path,
                       out_partitions=4)
    return docs_pdf, searcher, tv_path


# ------------------------------------------------------------ elevate.xml

ELEVATE_XML = """
<elevate>
  <query text="AAA">
    <doc id="7"/>
    <doc id="9"/>
    <doc id="11" exclude="true"/>
  </query>
  <query text="ipod">
    <doc id="1"/>
  </query>
</elevate>
"""


def test_parse_elevate_xml():
    m = parse_elevate_xml(ELEVATE_XML)
    # keys are ANALYZED query text (lowercased by the chain)
    assert m[analyzed_key("aaa")] == (["7", "9"], ["11"])
    assert m[analyzed_key("AAA")] == (["7", "9"], ["11"])
    assert m[analyzed_key("iPod")] == (["1"], [])


def test_parse_elevate_xml_rejects_dtd_and_bad_shape():
    with pytest.raises(ValueError, match="DTD"):
        parse_elevate_xml("<!DOCTYPE foo [<!ENTITY a 'b'>]><elevate/>")
    with pytest.raises(ValueError, match="root"):
        parse_elevate_xml("<nope/>")
    with pytest.raises(ValueError, match="missing id"):
        parse_elevate_xml('<elevate><query text="x"><doc/></query></elevate>')


# -------------------------------------------------------- apply_elevation

def _hits_df(spark):
    rows = [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0), (5, 1.0)]
    return spark.createDataFrame(rows, "docid long, score double")


def test_apply_elevation_order_and_exclude(spark):
    out = apply_elevation(_hits_df(spark), elevate_ids=[4, 3],
                          exclude_ids=[2], k=10).toPandas()
    # configured order first (4 before 3 despite lower score), then by
    # score; 2 dropped
    assert out["docid"].tolist() == [4, 3, 1, 5]
    assert out["elevated"].tolist() == [True, True, False, False]


def test_apply_elevation_mark_excludes_and_exclusive(spark):
    out = apply_elevation(_hits_df(spark), elevate_ids=[4], exclude_ids=[2],
                          k=10, mark_excludes=True).toPandas()
    assert out["docid"].tolist() == [4, 1, 2, 3, 5]
    assert out.set_index("docid")["excluded"].to_dict() == {
        1: False, 2: True, 3: False, 4: False, 5: False}
    only = apply_elevation(_hits_df(spark), elevate_ids=[5, 2], k=10,
                           exclusive=True).toPandas()
    assert only["docid"].tolist() == [5, 2]


def test_apply_elevation_k_truncates(spark):
    out = apply_elevation(_hits_df(spark), elevate_ids=[5], k=2).toPandas()
    assert out["docid"].tolist() == [5, 1]


# -------------------------------------------------------- elevated_search

def test_elevated_search_inserts_and_pins(built):
    docs_pdf, searcher, _ = built
    base = searcher.search("mohulgar", k=10).toPandas()
    assert len(base) > 2, "fixture term should match"
    # pin the 3rd hit above the 1st, insert one doc that does NOT match
    third = int(base["docid"].iloc[2])
    matched = set(searcher.search("mohulgar", k=N_DOCS).toPandas()["docid"])
    all_ids = [r["docid"] for r in searcher.spark.read.parquet(
        searcher.paths.docs).select("docid").collect()]
    nonmatch = next(d for d in sorted(all_ids) if d not in matched)
    elevations = {analyzed_key("mohulgar"): ([str(third), str(nonmatch)], [])}
    out = elevated_search(searcher, "mohulgar", elevations, k=10).toPandas()
    assert out["docid"].iloc[0] == third
    assert out["docid"].iloc[1] == nonmatch          # forced insert
    assert out["score"].iloc[1] == 0.0
    assert out["elevated"].tolist()[:2] == [True, True]
    # tail is the plain ranking minus the pinned doc
    rest = [d for d in base["docid"].tolist() if d != third][:8]
    assert out["docid"].tolist()[2:] == rest


def test_elevated_search_below_window_gets_real_score(built):
    """An elevated doc that MATCHES the query but ranks below the
    fetched top-(k+n) window must surface with its true BM25 score,
    not the 0.0 insert sentinel (ADVICE r4)."""
    _, searcher, _ = built
    full = searcher.search("mohulgar", k=N_DOCS).toPandas()
    # need a match far enough down that k=1 (+2 head-room) misses it
    if len(full) < 6:
        pytest.skip("fixture term matches too few docs")
    deep = full.iloc[-1]     # the weakest true match
    elevations = {analyzed_key("mohulgar"): ([str(int(deep["docid"]))], [])}
    out = elevated_search(searcher, "mohulgar", elevations, k=1).toPandas()
    assert out["docid"].iloc[0] == deep["docid"]
    assert out["score"].iloc[0] == pytest.approx(deep["score"]), \
        "forced-in matching doc must carry its real match score"


def test_elevated_search_miss_is_plain_search(built):
    _, searcher, _ = built
    elevations = {analyzed_key("zzzznotaquery"): (["1"], [])}
    out = elevated_search(searcher, "mohulgar", elevations, k=5).toPandas()
    base = searcher.search("mohulgar", k=5).toPandas()
    assert out["docid"].tolist() == base["docid"].tolist()


# ------------------------------------------------- term vector component

def _some_docids(searcher, n):
    rows = (searcher.spark.read.parquet(searcher.paths.docs)
            .select("docid").orderBy("docid").limit(n * 7).collect())
    return [r["docid"] for r in rows][::7][:n]


def test_term_vectors_for_docs_matches_single_doc_fetch(built):
    _, searcher, tv_path = built
    docids = _some_docids(searcher, 3)
    out = term_vectors_for_docs(searcher.spark, tv_path, docids,
                                positions=True, offsets=True).toPandas()
    assert set(out["docid"]) == set(docids)
    for did in docids:
        single = get_term_vector(searcher.spark, tv_path, did)
        got = out[out["docid"] == did].sort_values("term")
        assert got["term"].tolist() == single["term"].tolist()
        assert got["tf"].tolist() == single["tf"].tolist()
        assert [list(p) for p in got["positions"]] == \
            single["positions"].tolist()
        assert [list(s) for s in got["starts"]] == single["starts"].tolist()


def test_term_vectors_df_and_tfidf(built):
    _, searcher, tv_path = built
    out = term_vectors_for_docs(searcher.spark, tv_path,
                                _some_docids(searcher, 1),
                                termstats_path=searcher.paths.termstats,
                                df_counts=True, tf_idf=True).toPandas()
    assert len(out) > 0
    st = searcher.term_stats(out["term"].tolist()).set_index("term")
    for _, r in out.iterrows():
        assert r["df"] == int(st.loc[r["term"], "df"])
        # the reference's "tf-idf" is literally tf/df
        assert r["tf_idf"] == pytest.approx(r["tf"] / r["df"])


def test_handler_wiring(built):
    _, searcher, tv_path = built
    from lucene_solr_1_spark.solr.components import default_handler
    pin = int(searcher.search("mohulgar", k=3).toPandas()["docid"].iloc[2])
    elevations = parse_elevate_xml(
        f'<elevate><query text="mohulgar"><doc id="{pin}"/></query></elevate>')
    resp = default_handler().handle(searcher, {
        "q": "mohulgar", "rows": 5, "elevations": elevations,
        "tv": True, "tv.path": tv_path, "tv.df": True})
    hits = resp["hits"].toPandas()
    assert hits["docid"].iloc[0] == pin and bool(hits["elevated"].iloc[0])
    tvs = resp["termVectors"].toPandas()
    assert set(tvs["docid"]) <= set(hits["docid"])
    assert {"term", "tf", "df"} <= set(tvs.columns)
