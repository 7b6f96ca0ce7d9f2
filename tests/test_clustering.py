# STC search-result clustering (solr/contrib/clustering twin):
# algorithm behavior per Zamir & Etzioni SIGIR'98 + Carrot2 defaults,
# output shape per CarrotClusteringEngine.clusterToNamedList.
from lucene_solr_1_spark.solr.clustering import (cluster_results,
                                                 cluster_results_df)


def mk(i, title, snippet=""):
    return {"doc_id": i, "title": title, "snippet": snippet}


# 20 docs so the STC effective-word bounds (df >= 3, df <= 40% of the
# collection) admit the topical words: jaguar df=6 (30%), cat/car df=3
CORPUS = [
    mk(1, "apache spark streaming guide",
       "structured streaming processes unbounded data"),
    mk(2, "apache spark streaming tutorial",
       "structured streaming windows and watermarks"),
    mk(3, "apache spark sql reference",
       "dataframes and structured streaming basics"),
    mk(4, "jaguar cat species profile",
       "jaguar cat hunts near rainforest rivers"),
    mk(5, "jaguar cat habitat report",
       "jaguar cat populations across wetlands"),
    mk(6, "vintage jaguar car restoration",
       "restoring jaguar car engine blocks"),
    mk(7, "jaguar car dealership listings",
       "new jaguar car models priced today"),
    mk(8, "unrelated knitting patterns",
       "wool scarves plus mittens during winter"),
    mk(9, "jaguar cat tracking study",
       "jaguar cat ranges measured by collar"),
    mk(10, "jaguar car auction results",
        "classic jaguar car prices climbed again"),
    mk(11, "sourdough bread hydration notes", "flour water salt ratios"),
    mk(12, "alpine hiking trail conditions", "snowpack melts above ridge"),
    mk(13, "quantum dot display physics", "emission spectra narrowed"),
    mk(14, "urban beekeeping rooftop hives", "nectar flows each spring"),
    mk(15, "violin bow rehair interval", "horsehair wears after months"),
    mk(16, "ceramic kiln firing schedule", "cone six ramps slowly"),
    mk(17, "tidepool ecology field notes", "anemones close at low tide"),
    mk(18, "marathon taper week plan", "mileage drops before race"),
    mk(19, "homemade yogurt culture tips", "incubate overnight warmth"),
    mk(20, "night sky photography settings", "long exposures need tripods"),
]


def test_clusters_form_around_shared_phrases():
    clusters = cluster_results(CORPUS)
    by_label = {tuple(c["labels"][:1]): c for c in clusters
                if not c.get("other")}
    all_labels = " | ".join(l for c in clusters for l in c["labels"])
    assert "jaguar cat" in all_labels
    assert "jaguar car" in all_labels
    cat = next(c for c in clusters if "jaguar cat" in c["labels"])
    car = next(c for c in clusters if "jaguar car" in c["labels"])
    assert set(cat["docs"]) == {4, 5, 9}
    assert set(car["docs"]) == {6, 7, 10}


def test_other_topics_collects_unclustered():
    clusters = cluster_results(CORPUS)
    other = [c for c in clusters if c.get("other")]
    assert len(other) == 1
    assert {8, 11, 20} <= set(other[0]["docs"])
    assert other[0] is clusters[-1]  # trailing group


def test_subsumed_phrases_dropped():
    # "apache spark" and "spark streaming" share doc sets with longer
    # phrases only partially; the full "apache spark streaming" (docs
    # 1,2) must appear as a label rather than a same-coverage subphrase
    clusters = cluster_results(CORPUS)
    labels = [l for c in clusters for l in c["labels"]]
    assert any("spark" in l for l in labels)
    # no label is a strict same-coverage subphrase of another label in
    # the same cluster's label list
    for c in clusters:
        for l in c["labels"]:
            assert not any(l != o and f" {l} " in f" {o} "
                           and o.count(" ") == l.count(" ")
                           for o in c["labels"])


def test_single_word_penalty_and_stopwords():
    docs = [mk(i, f"the results {w}", "") for i, w in
            enumerate(["alpha", "alpha", "beta", "beta", "gamma",
                       "delta"])]
    clusters = cluster_results(docs, min_base_cluster_score=0.5)
    # "the" is a stopword: never a label on its own
    labels = [l for c in clusters for l in c["labels"]]
    assert "the" not in labels


def test_merge_threshold():
    # two base clusters over the same docs merge into one cluster
    docs = [mk(1, "green tea health benefits", ""),
            mk(2, "green tea health benefits", ""),
            mk(3, "green tea health benefits", "")]
    clusters = cluster_results(docs, min_base_cluster_score=0.5)
    real = [c for c in clusters if not c.get("other")]
    assert len(real) == 1
    assert set(real[0]["docs"]) == {1, 2, 3}


def test_empty_and_tiny_inputs():
    assert cluster_results([]) == []
    one = cluster_results([mk(1, "solo document", "")])
    assert len(one) == 1 and one[0].get("other")


def test_phrases_never_span_title_snippet_boundary():
    # a phantom phrase made of title-tail + snippet-head must not
    # become a base cluster
    docs = [mk(i, "rooftop solar power", "battery storage sizing grows")
            for i in range(1, 7)] + \
           [mk(i, f"filler topic {i}", f"distinct body {i}")
            for i in range(7, 16)]
    clusters = cluster_results(docs, min_base_cluster_score=0.5)
    labels = [l for c in clusters for l in c["labels"]]
    assert not any("power battery" in l for l in labels)


def test_string_doc_ids(spark):
    df = spark.createDataFrame(
        [(1, f"doc-{d['doc_id']:04d}", d["title"], d["snippet"])
         for d in CORPUS],
        "query_id long, doc_id string, title string, snippet string")
    out = cluster_results_df(df).collect()
    cat = next(r for r in out if "jaguar cat" in r.labels)
    assert set(cat.docs) == {"doc-0004", "doc-0005", "doc-0009"}


def test_spark_surface(spark):
    rows = []
    for q in (100, 200):
        for d in CORPUS:
            rows.append((q, d["doc_id"], d["title"], d["snippet"]))
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, title string, snippet string")
    out = cluster_results_df(df).collect()
    qids = {r.query_id for r in out}
    assert qids == {100, 200}
    for q in (100, 200):
        labels = [l for r in out if r.query_id == q for l in r.labels]
        assert "jaguar cat" in labels and "jaguar car" in labels
