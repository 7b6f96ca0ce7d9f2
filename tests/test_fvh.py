# FastVectorHighlighter twin: exact-string vectors from
# lucene/highlighter/src/test/.../vectorhighlight/FastVectorHighlighterTest.java
# (MockAnalyzer default = whitespace + lowercase).
from lucene_solr_1_spark.search.fvh import (FieldQuery, field_phrase_list,
                                            fvh_highlight,
                                            whitespace_positions)

SIMPLE = "This is a test where foo is highlighed and should be highlighted"
LONG = ("Netscape was the general name for a series of web browsers "
        "originally produced by Netscape Communications Corporation, now "
        "a subsidiary of AOL The original browser was once the dominant "
        "browser in terms of usage share, but as a result of the first "
        "browser war it lost virtually all of its share to Internet "
        "Explorer Netscape was discontinued and support for all Netscape "
        "browsers and client products was terminated on March 1, 2008 "
        "Netscape Navigator was the name of Netscape's web browser from "
        "versions 1.0 through 4.8 The first beta release versions of the "
        "browser were released in 1994 and known as Mosaic and then "
        "Mosaic Netscape until a legal challenge from the National "
        "Center for Supercomputing Applications (makers of NCSA Mosaic, "
        "which many of Netscape's founders used to develop), led to the "
        "name change to Netscape Navigator The company's name also "
        "changed from Mosaic Communications Corporation to Netscape "
        "Communications Corporation The browser was easily the most "
        "advanced...")


def test_simple_highlight():
    # testSimpleHighlightTest:45-73 — centered fragments
    q = [("term", "foo")]
    assert fvh_highlight(SIMPLE, q, frag_char_size=54) == [
        "This is a test where <b>foo</b> is highlighed and should be "
        "highlighted"]
    assert fvh_highlight(SIMPLE, q, frag_char_size=52) == [
        "This is a test where <b>foo</b> is highlighed and should be"]
    assert fvh_highlight(SIMPLE, q, frag_char_size=30) == [
        "a test where <b>foo</b> is highlighed"]


def test_boolean_terms_long_text():
    # testPhraseHighlightLongTextTest:75-119 — separate tags for
    # independent terms, ONE merged tag for the contiguous phrase
    got = fvh_highlight(LONG, [("term", "internet"), ("term", "explorer")],
                        frag_char_size=128)
    assert got == [
        "first browser war it lost virtually all of its share to "
        "<b>Internet</b> <b>Explorer</b> Netscape was discontinued and "
        "support for all Netscape browsers"]
    got = fvh_highlight(LONG, [("phrase", ["internet", "explorer"], 0, 1.0)],
                        frag_char_size=128)
    assert got == [
        "first browser war it lost virtually all of its share to "
        "<b>Internet Explorer</b> Netscape was discontinued and support "
        "for all Netscape browsers"]


def test_phrase_highlight_cases():
    # testPhraseHighlightTest:121-246, no_long_term field
    q_bool = [("term", "test"), ("term", "foo"), ("term", "highlighed")]
    assert fvh_highlight(SIMPLE, q_bool, frag_char_size=18) == [
        "<b>foo</b> is <b>highlighed</b> and"]

    # boolean with a slop-5 phrase: at 18 the 28-char match is rejected
    # (acceptPhrase), at 30 each term bolds separately (gaps > 0 keep
    # the offsets unmerged)
    q_mixed = [("term", "foo"),
               ("phrase", ["test", "foo", "highlighed"], 5, 1.0),
               ("term", "highlighed")]
    assert fvh_highlight(SIMPLE, q_mixed, frag_char_size=18) == []
    assert fvh_highlight(SIMPLE, q_mixed, frag_char_size=30) == [
        "a <b>test</b> where <b>foo</b> is <b>highlighed</b> and"]

    q_slop3 = [("phrase", ["test", "foo", "highlighed"], 3, 1.0)]
    assert fvh_highlight(SIMPLE, q_slop3, frag_char_size=18) == []
    assert fvh_highlight(SIMPLE, q_slop3, frag_char_size=30) == [
        "a <b>test</b> where <b>foo</b> is <b>highlighed</b> and"]

    # slop-30 phrase spanning 54 chars: rejected at 18
    q_wide = [("phrase", ["test", "foo", "highlighted"], 30, 1.0)]
    assert fvh_highlight(SIMPLE, q_wide, frag_char_size=18) == []


def test_long_term_field():
    # testPhraseHighlightTest long_term block: a single term longer
    # than fragCharSize still highlights whole
    text = ("This is a test thisisaverylongwordandmakessurethisfails "
            "where foo is highlighed and should be highlighted")
    q = [("term", "thisisaverylongwordandmakessurethisfails"),
         ("term", "foo"), ("term", "highlighed")]
    assert fvh_highlight(text, q, frag_char_size=18) == [
        "<b>thisisaverylongwordandmakessurethisfails</b>"]


def test_phrase_requires_contiguity():
    # phraseHighlight: a phrase does NOT highlight scattered terms
    got = fvh_highlight("internet is cool and explorer is too",
                        [("phrase", ["internet", "explorer"], 0, 1.0)],
                        frag_char_size=40)
    assert got == []


def test_phrase_highlight_off_falls_back_to_terms():
    got = fvh_highlight("internet is cool and explorer is too",
                        [("phrase", ["internet", "explorer"], 0, 1.0)],
                        frag_char_size=40, phrase_highlight=False)
    assert got and "<b>internet</b>" in got[0]


def test_pushback_shortening():
    # FieldPhraseList:88-97 — a failed 3-term candidate re-tries its
    # prefixes: phrase (a b) matches inside text "a b x"
    fq = FieldQuery([("phrase", ["a", "b", "c"], 0, 1.0),
                     ("phrase", ["a", "b"], 0, 2.0)])
    stack = whitespace_positions("a b x")
    phrases = field_phrase_list(stack, fq)
    assert len(phrases) == 1
    assert phrases[0].boost == 2.0
    assert phrases[0].toffs == [[0, 3]]  # merged adjacent offsets


def test_pushback_respects_slop():
    # searchPhrase gates on isValidTermOrPhrase (FieldQuery.java:428):
    # the shortened candidate [a, b] is slop-0 but a and b sit 3
    # positions apart, so the push-back must NOT highlight it
    text = "a x x b " + "y " * 40 + "c"
    q = [("phrase", ["a", "b"], 0, 1.0),
         ("phrase", ["a", "b", "c"], 5, 1.0)]
    assert fvh_highlight(text, q, frag_char_size=30) == []


def test_score_order_prefers_higher_boost():
    text = "alpha one two three beta beta beta end of text here"
    got = fvh_highlight(text, [("term", "alpha", 10.0), ("term", "beta")],
                        frag_char_size=20, max_num_fragments=2)
    assert got[0].startswith("<b>alpha</b>")
