"""WordBreakSpellChecker + StringDistance + AnalyzingInfixSuggester
twins, pinned by the reference's own test vectors (ref:
lucene/suggest/src/test/.../spell/TestWordBreakSpellChecker.java,
TestJaroWinklerDistance.java, TestNGramDistance.java,
TestLuceneLevenshteinDistance vectors, and the AnalyzingInfixSuggester
javadoc/lookup contract)."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_1_spark.solr.spelldist import (
    jaro_winkler, lucene_levenshtein, levenstein, ngram_distance)
from lucene_solr_1_spark.solr.suggest import (
    build_infix_suggester, infix_suggest, word_breaks, word_combinations)

ONES = ["", "one", "two", "three", "four", "five", "six", "seven", "eight",
        "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
        "sixteen", "seventeen", "eighteen", "nineteen"]
TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
        "eighty", "ninety"]


def _eng(i: int) -> str:
    """English.intToEnglish analog for 900..1111 with '-'/',' split to
    spaces — the reference test's corpus generator."""
    parts = []
    if i >= 1000:
        parts += ["one", "thousand"]
        i -= 1000
    if i >= 100:
        parts += [ONES[i // 100], "hundred"]
        i %= 100
    if i >= 20:
        parts.append(TENS[i // 10])
        i %= 10
    if 0 < i < 20:
        parts.append(ONES[i])
    return " ".join(parts)


@pytest.fixture(scope="module")
def termstats(spark):
    """df(term) over the TestWordBreakSpellChecker corpus: numbers
    900..1111 in English + the three extra docs."""
    docs = [_eng(i) for i in range(900, 1112)]
    docs += ["thou hast sand betwixt thy toes",
             "hundredeight eightyeight yeight",
             "tres y cinco"]
    rows = [(t,) for d in docs for t in set(d.split())]
    return (spark.createDataFrame(rows, "term string")
            .groupBy("term").agg(F.count("*").cast("long").alias("df")))


def test_break_ninetynine(termstats):
    sw = word_breaks(termstats, "ninetynine", max_suggestions=5,
                     max_changes=1, min_break_length=1)
    assert [w["string"] for w in sw[0]] == ["ninety", "nine"]
    assert [w["score"] for w in sw[0]] == [1, 1]


def test_break_onethousand_two_changes(termstats):
    sw = word_breaks(termstats, "onethousand", max_suggestions=2,
                     max_changes=1)
    assert [w["string"] for w in sw[0]] == ["one", "thousand"]
    sw = word_breaks(termstats, "onethousand", max_suggestions=2,
                     max_changes=2)
    assert [w["string"] for w in sw[0]] == ["one", "thousand"]
    assert [w["string"] for w in sw[1]] == ["one", "thou", "sand"]
    assert [w["score"] for w in sw[1]] == [2, 2, 2]
    # freq facts the reference asserts
    assert sw[0][1]["freq"] > 1
    assert sw[0][0]["freq"] > sw[0][1]["freq"]


def test_break_in_index_suppressed(termstats):
    # "eightyeight" itself is indexed -> SUGGEST_WHEN_NOT_IN_INDEX
    # yields []; SUGGEST_ALWAYS still breaks it into eighty+eight
    assert word_breaks(termstats, "eightyeight") == []
    sw = word_breaks(termstats, "eightyeight",
                     suggest_mode="SUGGEST_ALWAYS")
    assert [w["string"] for w in sw[0]] == ["eighty", "eight"]


def test_combine_always(termstats):
    terms = ["one", "hun", "dred", "eight", "y", "eight"]
    cs = word_combinations(termstats, terms, max_suggestions=10,
                           suggest_mode="SUGGEST_ALWAYS", max_changes=3,
                           max_combine_length=20,
                           min_suggestion_frequency=1)
    assert len(cs) == 5
    assert (cs[0]["string"], cs[0]["score"], cs[0]["indexes"]) == \
        ("hundred", 1, [1, 2])
    assert (cs[1]["string"], cs[1]["indexes"]) == ("eighty", [3, 4])
    assert (cs[2]["string"], cs[2]["indexes"]) == ("yeight", [4, 5])
    assert {cs[3]["string"], cs[4]["string"]} == \
        {"hundredeight", "eightyeight"}
    assert cs[3]["score"] == cs[4]["score"] == 2


def test_combine_when_not_in_index(termstats):
    terms = ["one", "hun", "dred", "eight", "y", "eight"]
    cs = word_combinations(termstats, terms, max_suggestions=5,
                           suggest_mode="SUGGEST_WHEN_NOT_IN_INDEX",
                           max_changes=3)
    assert [(c["string"], c["score"]) for c in cs] == \
        [("hundred", 1), ("hundredeight", 2)]
    assert cs[1]["indexes"] == [1, 2, 3]


def test_combine_separator_barrier(termstats):
    terms = ["hun", "", "dred"]
    assert word_combinations(termstats, terms,
                             suggest_mode="SUGGEST_ALWAYS") == []


def test_jaro_winkler_reference_vectors():
    assert jaro_winkler("al", "al") == 1.0
    assert 0.961 < jaro_winkler("martha", "marhta") < 0.962
    assert 0.832 < jaro_winkler("jones", "johnson") < 0.833
    assert 0.958 < jaro_winkler("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < jaro_winkler("dwayne", "duane") < 0.841
    assert 0.813 < jaro_winkler("dixon", "dicksonx") < 0.814
    assert jaro_winkler("fvie", "ten") == 0.0
    assert (jaro_winkler("zac ephron", "zac efron")
            > jaro_winkler("zac ephron", "kai ephron"))
    assert (jaro_winkler("brittney spears", "britney spears")
            > jaro_winkler("brittney spears", "brittney startzman"))


def test_ngram_distance_reference_vectors():
    # per-n vectors from TestNGramDistance.testGetDistance{1,2,3}
    vectors = {
        1: [("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
            ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.75),
            ("dwayne", "duane", 0.666), ("dixon", "dicksonx", 0.5)],
        2: [("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
            ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.625),
            ("dwayne", "duane", 0.5833), ("dixon", "dicksonx", 0.5),
            ("a", "aa", 0.5)],
        3: [("martha", "marhta", 0.7222), ("jones", "johnson", 0.4762),
            ("natural", "contrary", 0.2083),
            ("abcvwxyz", "cabvwxyz", 0.5625), ("dwayne", "duane", 0.5277),
            ("dixon", "dicksonx", 0.4583)],
    }
    for n, vecs in vectors.items():
        assert ngram_distance("al", "al", n) == pytest.approx(1.0, 1e-3)
        assert ngram_distance("a", "a", n) == pytest.approx(1.0, 1e-3)
        assert ngram_distance("b", "a", n) == pytest.approx(0.0, abs=1e-3)
        assert ngram_distance("", "al", n) == pytest.approx(0.0, abs=1e-3)
        for s, t, want in vecs:
            assert ngram_distance(s, t, n) == pytest.approx(want, abs=1e-3)


def test_lucene_levenshtein_parallel_edits():
    # the javadoc's example: "ab" vs "bca" has OSA distance 3
    assert lucene_levenshtein("ab", "bca") == pytest.approx(1 - 3 / 2)
    # transposition is ONE edit: distance 1, scaled by min length
    assert lucene_levenshtein("martha", "marhta") == \
        pytest.approx(1 - 1 / 6, abs=1e-6)
    assert levenstein("martha", "marhta") == \
        pytest.approx(1 - 2 / 6, abs=1e-6)


def test_distance_udf_matches_python(spark):
    from lucene_solr_1_spark.solr.spelldist import distance_udf
    words = ["marhta", "martha", "marta", "mart", "m"]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = {r["term"]: r["d"] for r in
           df.select("term",
                     distance_udf("martha", "jarowinkler")("term")
                     .alias("d")).collect()}
    for w in words:
        assert got[w] == pytest.approx(jaro_winkler(w, "martha"), abs=1e-9)


@pytest.fixture(scope="module")
def infix_path(spark, tmp_root, termstats):
    rows = [("a penny saved is a penny earned", 10),
            ("a penny for your thoughts", 8),
            ("penny lane", 20),
            ("lend me a penny", 5),
            ("pennant race", 7)]
    df = spark.createDataFrame(rows, "surface string, weight long")
    path = os.path.join(tmp_root, "infix_sugg")
    build_infix_suggester(spark, df, "surface", "weight", path)
    return path


def test_infix_prefix_match_ranked_by_weight(spark, infix_path):
    got = infix_suggest(spark, infix_path, "penn", num=10)
    # every suggestion containing a token starting with "penn",
    # weight desc
    assert [g[0] for g in got] == [
        "penny lane", "a penny saved is a penny earned",
        "a penny for your thoughts", "pennant race", "lend me a penny"]
    assert [g[1] for g in got] == [20, 10, 8, 7, 5]


def test_infix_trailing_space_exact(spark, infix_path):
    # "penny " (trailing space) -> exact token match only: no pennant
    got = infix_suggest(spark, infix_path, "penny ", num=10)
    assert all("pennant" not in g[0] for g in got)
    assert len(got) == 4


def test_infix_all_terms_required(spark, infix_path):
    got = infix_suggest(spark, infix_path, "penny lane", num=10)
    assert [g[0] for g in got] == ["penny lane"]
    got = infix_suggest(spark, infix_path, "penny lane", num=10,
                        all_terms_required=False)
    # SHOULD: any clause may match; "pennant race" matches neither
    # the exact token "penny" nor a "lane" prefix
    assert [g[0] for g in got] == [
        "penny lane", "a penny saved is a penny earned",
        "a penny for your thoughts", "lend me a penny"]


def test_infix_highlight(spark, infix_path):
    got = infix_suggest(spark, infix_path, "penn", num=1,
                        do_highlight=True)
    # prefix match bolds ONLY the matched prefix
    assert got[0][0] == "<b>penn</b>y lane"
    got = infix_suggest(spark, infix_path, "penny", num=1,
                        do_highlight=True)
    assert got[0][0] == "<b>penny</b> lane"
