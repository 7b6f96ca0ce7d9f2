"""PII redaction + benchmark decontamination (datapipe/pii.py,
datapipe/decontam.py).

The load-bearing property for the contract is DIALECT PARITY: the same
RE2-safe pattern text must behave identically under Spark
(java.util.regex) and DuckDB (RE2), including word boundaries,
alternation order, and leftmost-first matching — probed here on
adversarial strings, not just the synthetic contract page.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_1_spark.datapipe.decontam import (benchmark_ngrams,
                                                   decontaminate,
                                                   flag_contaminated)
from lucene_solr_1_spark.datapipe.pii import (PII_PATTERNS, pii_stats,
                                              redact_pii)

ADVERSARIAL = [
    # plain one-of-each
    "mail a.b+c@x.co call +1 (415) 555-2671 ssn 123-45-6789 "
    "card 4111 1111 1111 1111 ip 10.2.3.45 end",
    # phone formats: parenthesized, dotted, dashed, bare 16-digit card
    "(212) 555-0100 and 212.555.0101 and 212-555-0102 card 4242424242424242",
    # things that must NOT redact: 3-3-3 digit runs, 5-octet dotted run,
    # version strings, SSN-like with letters attached
    "v1.2.3.4.5 build 123-456-789 x123-45-6789y 999.999 time 12:34:56",
    # boundaries: punctuation adjacent, multiple emails, trailing dot
    "a@b.io,c@d.org. (ip 192.168.0.1) +44 20 7946 0958?",
    # digit-run edges around cards/ssn
    "41111 1111 1111 1111 123-45-67890 1234-5678-9012-3456",
]


def _duck_redact(text: str) -> tuple[str, list[int]]:
    con = duckdb.connect()
    out = "t"
    for _n, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    counts = ", ".join(
        "len(regexp_extract_all(t, '{}'))".format(pat.replace("'", "''"))
        for _n, pat, _r in PII_PATTERNS)
    row = con.execute(
        f"SELECT {out}, {counts} FROM (SELECT ? AS t)", [text]).fetchone()
    return row[0], list(row[1:])


def test_redaction_dialect_parity(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(ADVERSARIAL)),
                      "text": ADVERSARIAL}))
    got = redact_pii(df, "text").orderBy("doc_id").collect()
    for row in got:
        duck_red, duck_counts = _duck_redact(ADVERSARIAL[row.doc_id])
        assert row.redacted == duck_red, ADVERSARIAL[row.doc_id]
        spark_counts = [row[f"n_{n}"] for n, _p, _r in PII_PATTERNS]
        assert spark_counts == duck_counts, ADVERSARIAL[row.doc_id]


def test_redaction_expectations(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [ADVERSARIAL[0]]}))
    row = redact_pii(df, "text").first()
    assert "<EMAIL>" in row.redacted and "<PHONE>" in row.redacted
    assert "<SSN>" in row.redacted and "<CC>" in row.redacted
    assert "<IP>" in row.redacted
    assert row.n_email == 1 and row.n_ssn == 1 and row.n_cc == 1
    assert row.n_phone == 1 and row.n_ipv4 == 1
    # negatives: version strings / 3-3-3 runs stay intact
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [ADVERSARIAL[2]]}))
    row2 = redact_pii(df2, "text").first()
    assert row2.n_email == 0 and row2.n_ssn == 0 and row2.n_cc == 0
    assert "123-456-789" in row2.redacted        # not a phone (3-3-3)


def test_pii_stats(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(ADVERSARIAL)),
                      "text": ADVERSARIAL}))
    row = pii_stats(df, "text").first()
    assert row.docs_email == 2            # doc 0 and doc 3
    assert row.total_email == 3           # doc 3 has two
    # docs 0 and 3 carry real IPs; doc 2's "v1.2.3.4.5" also hits via
    # the sub-match "2.3.4.5" (\b holds after '.'; RE2 has no lookaround
    # to demand a non-digit run edge) — a documented over-trigger the
    # parity test pins to behave identically in both engines
    assert row.docs_ipv4 == 3


@pytest.fixture(scope="module")
def corpus(spark):
    bench = ["the quick brown fox jumps over the lazy dog tonight again",
             "benchmark only sentence that no training doc ever repeats"]
    train = [
        # full containment of bench gram span (contaminated)
        "prefix words then the quick brown fox jumps over the lazy dog "
        "tonight again and a suffix",
        # shares only a 7-gram, not an 8-gram (clean at n=8)
        "quick brown fox jumps over the lazy cat",
        # clean
        "completely unrelated text about spark query engines and shuffles",
        # punctuation/case-normalized containment (contaminated)
        "The QUICK, brown fox; jumps over the lazy dog tonight again!",
    ]
    b = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(bench)), "text": bench}))
    t = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(100, 100 + len(train)),
                      "text": train}))
    return b, t


def test_flag_contaminated(spark, corpus):
    bench, train = corpus
    grams = benchmark_ngrams(bench, n=8)
    flagged = {r.doc_id: (r.n_hit_grams, r.n_hit_distinct)
               for r in flag_contaminated(train, grams, n=8).collect()}
    assert set(flagged) == {100, 103}
    # doc 100 contains the full 11-word bench span -> 4 distinct 8-grams
    assert flagged[100] == (4, 4)
    assert flagged[103][1] >= 1


def test_decontaminate_and_hashed_parity(spark, corpus):
    bench, train = corpus
    clean = decontaminate(train, bench, n=8, hashed=True)
    assert sorted(r.doc_id for r in clean.collect()) == [101, 102]
    # hashed and string paths agree
    g_s = benchmark_ngrams(bench, n=8, hashed=False)
    g_h = benchmark_ngrams(bench, n=8, hashed=True)
    f_s = flag_contaminated(train, g_s, n=8, hashed=False)
    f_h = flag_contaminated(train, g_h, n=8, hashed=True)
    assert sorted(map(tuple, f_s.collect())) == sorted(map(tuple, f_h.collect()))


def test_decontam_broadcasts_benchmark_side(spark, corpus):
    bench, train = corpus
    grams = benchmark_ngrams(bench, n=8)
    plan = flag_contaminated(train, grams, n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
