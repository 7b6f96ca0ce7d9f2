"""lucene_solr_1_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of Apache Lucene/Solr 4.4 (reference at /root/reference),
re-expressed Spark-first: DataFrames + Catalyst for every relational
step, vectorized NumPy/Arrow kernels (pandas_udf / mapInPandas) for the
non-relational compute (tokenize, pack/unpack postings, BM25 scoring,
block-max WAND).

Subpackages
-----------
analysis   : StandardAnalyzer-equivalent tokenizer + HTML extraction
             (ref: lucene/analysis/common .../standard/StandardAnalyzer.java:110-122)
index      : norm codec, postings codec, distributed index build/merge
             (ref: lucene/core .../index/DocumentsWriterPerThread.java:58-80,
              codecs/lucene41/Lucene41PostingsWriter.java:226-268)
search     : BM25 scoring, boolean algebra, top-k, block-max WAND
             (ref: lucene/core .../search/similarities/BM25Similarity.java,
              search/BooleanQuery.java:302-361, search/TopScoreDocCollector.java)
solr       : faceting / stats / grouping / MLT analogs
             (ref: solr/core .../handler/component/*, lucene/grouping, lucene/facet)
datapipe   : large-scale training-data pipeline ops (dedup, ANN, text QA)
fixtures   : deterministic Common-Crawl-style webtext generator (FIXTURES.md)
"""

__version__ = "0.1.0"
