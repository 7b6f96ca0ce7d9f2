"""Quality benchmark (TREC-style IR evaluation) — benchmark/quality twin.

Reference: ``lucene/benchmark/src/java/org/apache/lucene/benchmark/
quality/`` — ``QualityStats.java`` (P@1..20, average precision, recall,
MRR with its rank<=5 quirk, and the `average()` good-queries-only
rule), ``trec/TrecJudge.java`` (qrels parsing + validateData),
``trec/TrecTopicsReader.java`` (<top>/<num>/<title>/<desc>/<narr>),
``utils/SimpleQQParser.java`` (topic title parsed as an OR query over
the body field), ``QualityBenchmark.java`` (execute loop).

Two surfaces:

* the scalar twins (``QualityStats``, ``TrecJudge``,
  ``read_trec_topics``, ``quality_benchmark``) reproduce the reference
  API for driver-side evaluation — the reference's own
  trecTopics/trecQRels/Reuters-578 fixtures run through the real
  engine in ``tests/test_quality.py``.
* ``quality_stats_df`` evaluates per-query stats DISTRIBUTED: one
  window partitioned by query (cumulative relevant count at each
  rank) plus one groupBy — the shape for scoring millions of eval
  queries against a 10^12-doc index's results, where the driver-side
  loop would never finish.  Judgments join is a plain equi-join; with
  a small qrels set Catalyst broadcasts it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

MAX_POINTS = 20  # QualityStats.MAX_POINTS


# --------------------------------------------------------------------------
# scalar twins


class QualityStats:
    """Single-query result quality (QualityStats.java:27-133)."""

    def __init__(self, max_good_points: float, search_time: int = 0):
        self.max_good_points = float(max_good_points)
        self.search_time = search_time
        self.recall = 0.0
        self.p_at = [0.0] * (MAX_POINTS + 1)  # p_at[0] unused
        self.p_relevant_sum = 0.0
        self.num_points = 0.0
        self.num_good_points = 0.0
        self.mrr = 0.0
        self.recall_points: list[tuple[int, float]] = []

    def add_result(self, n: int, is_relevant: bool) -> None:
        if abs(self.num_points + 1 - n) > 1e-6:
            raise ValueError(f"point {n} illegal after {self.num_points}")
        if is_relevant:
            self.num_good_points += 1
            self.recall_points.append((n, self.num_good_points))
            if len(self.recall_points) == 1 and n <= 5:
                # the reference only credits MRR inside the top 5
                # (QualityStats.java:88-90)
                self.mrr = 1.0 / n
        self.num_points = n
        p = self.num_good_points / self.num_points
        if is_relevant:
            self.p_relevant_sum += p
        if n < len(self.p_at):
            self.p_at[n] = p
        self.recall = (p if self.max_good_points <= 0
                       else self.num_good_points / self.max_good_points)

    def get_precision_at(self, n: int) -> float:
        if n < 1 or n > MAX_POINTS:
            raise ValueError(f"n={n} must be in [1,{MAX_POINTS}]")
        if n > self.num_points:
            # beyond the result list: relevant count / n
            # (QualityStats.java:112-114)
            return (self.num_points * self.p_at[int(self.num_points)]) / n
        return self.p_at[n]

    def get_avp(self) -> float:
        return (0.0 if self.max_good_points == 0
                else self.p_relevant_sum / self.max_good_points)

    def get_recall(self) -> float:
        return self.recall

    def get_mrr(self) -> float:
        return self.mrr

    @staticmethod
    def average(stats: list["QualityStats"]) -> "QualityStats":
        """Times average over ALL queries; quality measures only over
        queries with positive judgments (QualityStats.java:196-233)."""
        avg = QualityStats(0, 0)
        if not stats:
            return avg
        m = 0
        for s in stats:
            avg.search_time += s.search_time
            if s.max_good_points > 0:
                m += 1
                avg.num_good_points += s.num_good_points
                avg.num_points += s.num_points
                avg.p_relevant_sum += s.get_avp()
                avg.recall += s.recall
                avg.mrr += s.get_mrr()
                avg.max_good_points += s.max_good_points
                for j in range(1, len(avg.p_at)):
                    avg.p_at[j] += s.get_precision_at(j)
        assert m > 0, "no good queries"
        avg.search_time //= len(stats)
        avg.num_good_points /= m
        avg.num_points /= m
        avg.recall /= m
        avg.mrr /= m
        avg.max_good_points /= m
        for j in range(1, len(avg.p_at)):
            avg.p_at[j] /= m
        avg.p_relevant_sum /= m
        avg.p_relevant_sum *= avg.max_good_points  # so get_avp() is right
        return avg


class QualityQuery:
    """ID + name/value properties (QualityQuery.java)."""

    def __init__(self, query_id: str, name_val_pairs: dict[str, str]):
        self.query_id = query_id
        self.name_val_pairs = name_val_pairs

    def get_value(self, name: str) -> str | None:
        return self.name_val_pairs.get(name)


class TrecJudge:
    """Qrels judge: ``queryID  0  docName  rel`` lines
    (trec/TrecJudge.java:44-82)."""

    def __init__(self, lines) -> None:
        self.judgements: dict[str, set[str]] = {}
        for line in lines:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) != 4:
                raise ValueError(f"bad qrels line: {line!r}")
            qid, zero, doc_name, rel = parts
            if zero != "0":
                raise ValueError(f"expected '0' in qrels line: {line!r}")
            if int(rel):  # only relevant docs are kept
                self.judgements.setdefault(qid, set()).add(doc_name)
            else:
                self.judgements.setdefault(qid, set())

    def is_relevant(self, doc_name: str, query: QualityQuery) -> bool:
        rel = self.judgements.get(query.query_id)
        return rel is not None and doc_name in rel

    def max_recall(self, query: QualityQuery) -> int:
        return len(self.judgements.get(query.query_id, ()))

    def validate_data(self, qqs: list[QualityQuery]) -> bool:
        """Topics and judgments must cover each other
        (TrecJudge.java:113-135)."""
        missing = set(self.judgements) - {q.query_id for q in qqs}
        extra = {q.query_id for q in qqs} - set(self.judgements)
        return not missing and not extra


_TOP_RE = re.compile(r"<top>(.*?)</top>", re.S)
_NUM_RE = re.compile(r"<num>\s*Number:\s*(\S+)")
_TITLE_RE = re.compile(r"<title>\s*([^\n]*)")
_DESC_RE = re.compile(r"<desc>[^\n]*\n(.*?)(?=<narr>|$)", re.S)
_NARR_RE = re.compile(r"<narr>[^\n]*\n(.*?)$", re.S)


def read_trec_topics(text: str) -> list[QualityQuery]:
    """TrecTopicsReader twin: title on the tag line, desc/narr bodies
    on the following lines (trec/TrecTopicsReader.java:55-120)."""
    out = []
    for m in _TOP_RE.finditer(text):
        block = m.group(1)
        num = _NUM_RE.search(block)
        title = _TITLE_RE.search(block)
        props = {}
        if title:
            props["title"] = title.group(1).strip()
        d = _DESC_RE.search(block)
        if d:
            props["description"] = " ".join(d.group(1).split())
        n = _NARR_RE.search(block)
        if n:
            props["narrative"] = " ".join(n.group(1).split())
        out.append(QualityQuery(num.group(1).strip(), props))
    # file order preserved, exactly like TrecTopicsReader (the i%8
    # structure of the reference's own qrels depends on it)
    return out


def quality_benchmark(searcher, qqs: list[QualityQuery], judge: TrecJudge,
                      max_results: int = 1000, qq_name: str = "title",
                      similarity=None) -> list[QualityStats]:
    """QualityBenchmark.execute twin: for each topic, parse the title
    as an OR query over the body (utils/SimpleQQParser.java:54-62),
    search top ``max_results``, judge each ranked doc
    (QualityBenchmark.java:103-147).  ``searcher`` is the engine's
    IndexSearcher; doc names come from its stored ``url`` field."""
    stats = []
    for qq in qqs:
        topk = searcher.search(qq.get_value(qq_name), op="OR",
                               k=max_results, similarity=similarity)
        named = searcher.fetch_fields(topk).orderBy("rank")
        rows = named.select("rank", "url").collect()
        st = QualityStats(judge.max_recall(qq))
        for r in rows:
            st.add_result(int(r["rank"]), judge.is_relevant(r["url"], qq))
        stats.append(st)
    return stats


# --------------------------------------------------------------------------
# distributed surface


def quality_stats_df(results: DataFrame, judgments: DataFrame,
                     p_points: tuple[int, ...] = (5, 10, 20)) -> DataFrame:
    """Per-query QualityStats, distributed.

    results:   (query_id, rank, doc_name) — rank dense 1..n per query.
    judgments: (query_id, doc_name) — the RELEVANT docs (TrecJudge
               keeps only rel != 0 lines).

    One window partitioned by query_id (cumulative relevant count — the
    per-query partial nothing else needs), one groupBy for the scalars,
    one aggregate join for max_good.  P@n follows getPrecisionAt
    exactly: relevant-within-min(n, numPoints) / n.  MRR keeps the
    reference's rank<=5 rule.
    """
    rel = (results.join(judgments.withColumn("rel", F.lit(1)),
                        ["query_id", "doc_name"], "left")
           .withColumn("rel", F.coalesce("rel", F.lit(0))))
    w = Window.partitionBy("query_id").orderBy("rank")
    cum = rel.withColumn("cum_good", F.sum("rel").over(w))
    aggs = [
        F.max("rank").alias("num_points"),
        F.sum("rel").alias("num_good_points"),
        F.sum(F.when(F.col("rel") == 1,
                     F.col("cum_good") / F.col("rank"))).alias("p_rel_sum"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
    ]
    for n in p_points:
        aggs.append(F.sum(F.when((F.col("rel") == 1) & (F.col("rank") <= n),
                                 1).otherwise(0)).alias(f"_good_at_{n}"))
    per_q = cum.groupBy("query_id").agg(*aggs)
    max_good = (judgments.groupBy("query_id")
                .agg(F.count("*").alias("max_good_points")))
    out = (per_q.join(max_good, "query_id", "left")
           .withColumn("max_good_points",
                       F.coalesce("max_good_points", F.lit(0))))
    out = (out
           .withColumn("recall",
                       F.when(F.col("max_good_points") > 0,
                              F.col("num_good_points")
                              / F.col("max_good_points"))
                        .otherwise(F.col("num_good_points")
                                   / F.col("num_points")))
           .withColumn("avp",
                       F.when(F.col("max_good_points") > 0,
                              F.coalesce(F.col("p_rel_sum"), F.lit(0.0))
                              / F.col("max_good_points"))
                        .otherwise(F.lit(0.0)))
           .withColumn("mrr",
                       F.when(F.col("first_rel") <= 5,
                              1.0 / F.col("first_rel"))
                        .otherwise(F.lit(0.0))))
    for n in p_points:
        out = out.withColumn(f"p_at_{n}",
                             F.col(f"_good_at_{n}") / F.lit(float(n)))
    drop = ["p_rel_sum", "first_rel"] + [f"_good_at_{n}" for n in p_points]
    return out.drop(*drop)
