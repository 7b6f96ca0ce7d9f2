# Classic Highlighter twin: exact-string vectors from
# lucene/highlighter/src/test/.../highlight/HighlighterTest.java.
from lucene_solr_1_spark.search.classichl import (get_best_fragment,
                                                  get_best_fragments,
                                                  get_best_text_fragments,
                                                  simple_tokens)

T0 = ("Hello this is a piece of text that is very long and contains too "
      "much preamble and the meat is really here which says kennedy has "
      "been shot")
T1 = ("This piece of text refers to Kennedy at the beginning then has a "
      "longer piece of text that is very long in the middle and finally "
      "ends with another reference to Kennedy")


def test_common_terms_vectors():
    # testHighlightingCommonTermsQuery:131-146 — SimpleSpanFragmenter's
    # half-size tail guard keeps the 139-char text ONE fragment
    q = [("term", "this"), ("term", "long"), ("term", "very")]
    assert get_best_fragment(simple_tokens(T0), T0, q) == (
        "Hello <B>this</B> is a piece of text that is <B>very</B> "
        "<B>long</B> and contains too much preamble and the meat is "
        "really here which says kennedy has been shot")
    assert get_best_fragment(simple_tokens(T1), T1, q) == (
        "<B>This</B> piece of text refers to Kennedy at the beginning "
        "then has a longer piece of text that is <B>very</B>")


def test_off_by_one_null_fragmenter():
    # testOffByOne:1010-1021 (NullFragmenter = one whole-text fragment;
    # a huge fragment_size is the same thing)
    text = "help me [54-65]"
    got = get_best_fragment(simple_tokens(text), text,
                            [("term", "help")], fragment_size=10**9)
    assert got == "<B>help</B> me [54-65]"


def test_field_scoped_queries():
    # testFieldSpecificHighlighting:1530-1561 — field scoping is the
    # caller's choice of which clauses to extract
    text = "fred is one of the people"
    toks = simple_tokens(text)
    assert get_best_fragment(toks, text, [("term", "fred")],
                             fragment_size=10**9) == \
        "<B>fred</B> is one of the people"
    assert get_best_fragment(toks, text,
                             [("term", "fred"), ("term", "people")],
                             fragment_size=10**9) == \
        "<B>fred</B> is one of the <B>people</B>"


def test_phrase_position_sensitivity():
    # QueryScorer phrase terms only highlight inside matched spans
    text = "kennedy was shot but the shot kennedy story differs"
    toks = simple_tokens(text)
    got = get_best_fragment(toks, text,
                            [("phrase", ["kennedy", "was"], 0, 1.0)],
                            fragment_size=10**9)
    # only the first "kennedy" (inside the span) bolds; the bare
    # "shot"/"kennedy" later do not
    assert got == ("<B>kennedy</B> <B>was</B> shot but the shot kennedy "
                   "story differs")


def test_span_fragmenter_never_splits_inside_span():
    words = ["w%02d" % i for i in range(30)]
    words[14:16] = ["alpha", "beta"]
    text = " ".join(words)
    got = get_best_fragment(simple_tokens(text), text,
                            [("phrase", ["alpha", "beta"], 0, 1.0)],
                            fragment_size=20)
    assert "<B>alpha</B> <B>beta</B>" in got


def test_best_fragments_joins_positive_scores():
    text = ("alpha starts the text here with words. " + "pad " * 30 +
            "beta ends the text right here now truly.")
    got = get_best_fragments(simple_tokens(text), text,
                             [("term", "alpha"), ("term", "beta")],
                             max_fragments=2, separator="...",
                             fragment_size=40)
    assert "<B>alpha</B>" in got and "<B>beta</B>" in got
    assert "..." in got


def test_no_match_returns_none():
    # Highlighter.getBestFragment is null when nothing matched
    # (only score>0 fragments are emitted, Highlighter.java:352-356)
    text = "nothing matches in here"
    assert get_best_fragment(simple_tokens(text), text,
                             [("term", "absent")]) is None


def test_fragment_score_counts_unique_terms_once():
    # QueryScorer.getTokenScore:125-131 — fragment score is per unique
    # term; the 3x repeated term does not beat two distinct terms
    text = "dup dup dup " + "x " * 60 + "one two"
    frags = get_best_text_fragments(
        simple_tokens(text), text,
        [("term", "dup"), ("term", "one"), ("term", "two")],
        fragment_size=40, max_fragments=3)
    best_text, best_score = frags[0]
    assert "<B>one</B> <B>two</B>" in best_text
    assert best_score == 2.0
