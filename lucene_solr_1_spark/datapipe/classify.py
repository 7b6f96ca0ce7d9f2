"""Classification — the lucene/classification module re-expressed as
DataFrame ops (ref: lucene/classification/src/java/org/apache/lucene/
classification/{SimpleNaiveBayesClassifier,KNearestNeighborClassifier}
.java, ~521 LoC module):

* Naive Bayes: train = two grouped aggregations over (class, token);
  predict = one broadcast-join + grouped log-sum + window argmax. The
  model tables are tiny (|vocab|·|classes|) next to the corpus, so
  training is one shuffle and prediction broadcasts the model — no
  per-row Python anywhere.
* kNN: score every (query, candidate) cosine via the exploded-embedding
  join (the ann module's layout), vote among the top k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def nb_train(docs: DataFrame, text_col: str = "text",
             label_col: str = "lang") -> dict[str, DataFrame]:
    """Multinomial NB with add-one smoothing. Returns the model as small
    DataFrames: priors(c, log_prior), likelihood(c, tok, cnt),
    class_size(c, total), vocab_size(v)."""
    tok = docs.select(label_col, F.explode(F.split(F.col(text_col), " "))
                      .alias("tok")).filter(F.col("tok") != "")
    n = docs.count()
    priors = (docs.groupBy(label_col).count()
              .select(F.col(label_col).alias("c"),
                      F.log(F.col("count") / F.lit(float(n))).alias("log_prior")))
    likelihood = (tok.groupBy(label_col, "tok").count()
                  .select(F.col(label_col).alias("c"), "tok",
                          F.col("count").cast("double").alias("cnt")))
    class_size = likelihood.groupBy("c").agg(F.sum("cnt").alias("total"))
    v = tok.select("tok").distinct().count()
    return {"priors": priors, "likelihood": likelihood,
            "class_size": class_size, "vocab": float(v)}


def nb_predict(docs: DataFrame, model: dict, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """DataFrame(id, predicted, score): argmax_c of the NB log-posterior.
    The model side is broadcast — the corpus is never reshuffled."""
    tf = (docs.select(id_col, F.explode(F.split(F.col(text_col), " "))
                      .alias("tok"))
          .filter(F.col("tok") != "")
          .groupBy(id_col, "tok").count()
          .withColumnRenamed("count", "tf"))
    cs = model["class_size"].join(model["priors"], "c")
    scored = (tf.crossJoin(F.broadcast(cs))
              .join(F.broadcast(model["likelihood"]), ["c", "tok"], "left")
              .groupBy(id_col, "c", "log_prior", "total")
              .agg(F.sum(F.col("tf") *
                         F.log((F.coalesce(F.col("cnt"), F.lit(0.0)) + 1.0)
                               / (F.col("total") + F.lit(model["vocab"]))))
                   .alias("ll"))
              .withColumn("score", F.col("log_prior") + F.col("ll")))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("c"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col), F.col("c").alias("predicted"), "score"))


def knn_predict(embeddings: DataFrame, query_ids: list[int],
                k: int = 8) -> DataFrame:
    """DataFrame(vec_id, predicted, votes): majority label among the k
    nearest cosine neighbors (excluding self) for each query vec_id."""
    e = embeddings.select("vec_id", "label", "embedding")
    q = e.filter(F.col("vec_id").isin(query_ids)) \
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe"))
    dot = F.aggregate(F.zip_with("embedding", "qe", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    pairs = (e.crossJoin(F.broadcast(q))
             .filter(F.col("vec_id") != F.col("qid"))
             .withColumn("cos", dot / (nrm(F.col("embedding"))
                                       * nrm(F.col("qe")))))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    top = pairs.withColumn("_rn", F.row_number().over(w)) \
               .filter(F.col("_rn") <= k)
    votes = top.groupBy("qid", "label").count() \
               .withColumnRenamed("count", "votes")
    w2 = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("label"))
    return (votes.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .select(F.col("qid").alias("vec_id"),
                    F.col("label").alias("predicted"), "votes"))
