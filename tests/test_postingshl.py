# PostingsHighlighter twin: exact-string vectors from
# lucene/highlighter/src/test/.../TestPostingsHighlighter.java.
from lucene_solr_1_spark.analysis.sentence import (SentenceBreakIterator,
                                                   WholeBreakIterator,
                                                   sentence_breaks)
from lucene_solr_1_spark.search.postingshl import (postings_highlight,
                                                   simple_offsets,
                                                   whitespace_offsets)

DOC1 = ("This is a test. Just a test highlighting from postings. "
        "Feel free to ignore.")


def test_basics():
    # TestPostingsHighlighter.testBasics:55-86 (MockAnalyzer=whitespace)
    assert postings_highlight(DOC1, ["highlighting"],
                              tokenizer=whitespace_offsets) == \
        "Just a test <b>highlighting</b> from postings. "
    assert postings_highlight("Highlighting the first term. Hope it works.",
                              ["highlighting"],
                              tokenizer=whitespace_offsets) == \
        "<b>Highlighting</b> the first term. "


def test_one_sentence():
    # :90-124 (SIMPLE tokenizer)
    assert postings_highlight("This is a test.", ["test"]) == \
        "This is a <b>test</b>."
    assert postings_highlight("Test a one sentence document.", ["test"]) == \
        "<b>Test</b> a one sentence document."


def test_multiple_terms():
    # :203-238
    assert postings_highlight(DOC1, ["highlighting", "just", "first"],
                              tokenizer=whitespace_offsets) == \
        "<b>Just</b> a test <b>highlighting</b> from postings. "
    assert postings_highlight("Highlighting the first term. Hope it works.",
                              ["highlighting", "just", "first"],
                              tokenizer=whitespace_offsets) == \
        "<b>Highlighting</b> the <b>first</b> term. "


def test_multiple_passages():
    # :240-272
    assert postings_highlight(DOC1, ["test"], max_passages=2) == \
        "This is a <b>test</b>. Just a <b>test</b> highlighting " \
        "from postings. "
    assert postings_highlight(
        "This test is another test. Not a good sentence. "
        "Test test test test.", ["test"], max_passages=2) == \
        "This <b>test</b> is another <b>test</b>. ... " \
        "<b>Test</b> <b>test</b> <b>test</b> <b>test</b>."


def test_passage_ranking():
    # :418-447 — pins the PassageScorer math exactly
    text = ("This is a test.  Just highlighting from postings. "
            "This is also a much sillier test.  Feel free to test test "
            "test test test test test.")
    assert postings_highlight(text, ["test"], max_passages=2) == \
        "This is a <b>test</b>.  ... Feel free to <b>test</b> " \
        "<b>test</b> <b>test</b> <b>test</b> <b>test</b> <b>test</b> " \
        "<b>test</b>."


def test_buddhism_phrase_terms():
    # :320-355 (phrase terms highlight individually)
    text = ("This eight-volume set brings together seminal papers in "
            "Buddhist studies from a vast range of academic disciplines "
            "published over the last forty years. With a new introduction "
            "by the editor, this collection is a unique and unrivalled "
            "research resource for both student and scholar. Coverage "
            "includes: - Buddhist origins; early history of Buddhism in "
            "South and Southeast Asia - early Buddhist Schools and "
            "Doctrinal History; Theravada Doctrine - the Origins and "
            "nature of Mahayana Buddhism; some Mahayana religious topics "
            "- Abhidharma and Madhyamaka - Yogacara, the Epistemological "
            "tradition, and Tathagatagarbha - Tantric Buddhism (Including "
            "China and Japan); Buddhism in Nepal and Tibet - Buddhism in "
            "South and Southeast Asia, and - Buddhism in China, East "
            "Asia, and Japan.")
    snippet = postings_highlight(text, ["buddhist", "origins"],
                                 max_passages=2)
    assert "<b>Buddhist</b> <b>origins</b>" in snippet


def test_curious_george_no_double_bold():
    # :356-385 — overlapping match handling never doubles text
    text = ("It’s the formula for success for preschoolers—Curious "
            "George and fire trucks! Curious George and the Firefighters "
            "is a story based on H. A. and Margret Rey’s popular primate "
            "and painted in the original watercolor and charcoal style. "
            "Firefighters are a famously brave lot, but can they "
            "withstand a visit from one curious monkey?")
    snippet = postings_highlight(text, ["curious", "george"],
                                 max_passages=2)
    assert "<b>Curious</b>Curious" not in snippet
    assert "<b>Curious</b> <b>George</b>" in snippet


def test_empty_highlight_first_sentences():
    # getEmptyHighlight (:576-594) via testEmptyHighlights semantics:
    # no match -> the first maxPassages sentences, unbolded
    assert postings_highlight(DOC1, ["absent"]) == "This is a test. "
    assert postings_highlight(DOC1, ["absent"], max_passages=2) == \
        "This is a test. Just a test highlighting from postings. "


def test_highlight_all_text_whole_break_iterator():
    # testHighlightAllText (:477-511): WholeBreakIterator = one passage
    text = ("This is a test.  Just highlighting from postings. "
            "This is also a much sillier test.  Feel free to test test "
            "test test test test test.")
    got = postings_highlight(text, ["test"], max_passages=2,
                             bi=WholeBreakIterator())
    assert got == ("This is a <b>test</b>.  Just highlighting from "
                   "postings. This is also a much sillier <b>test</b>.  "
                   "Feel free to <b>test</b> <b>test</b> <b>test</b> "
                   "<b>test</b> <b>test</b> <b>test</b> <b>test</b>.")


def test_max_length_truncates():
    # only content within maxLength is highlighted/emitted
    got = postings_highlight("short sentence. " * 10, ["sentence"],
                             max_length=16)
    assert got == "short <b>sentence</b>. "


def test_sentence_breaks_basics():
    t = DOC1
    b = sentence_breaks(t)
    assert [t[s:e] for s, e in zip(b, b[1:])] == [
        "This is a test. ", "Just a test highlighting from postings. ",
        "Feel free to ignore."]
    # SB8: lowercase continuation after an abbreviation-like ATerm
    t2 = "e.g. lower continues. Upper breaks."
    b2 = sentence_breaks(t2)
    assert [t2[s:e] for s, e in zip(b2, b2[1:])] == [
        "e.g. lower continues. ", "Upper breaks."]
    assert sentence_breaks("") == [0]
    # SB3/SB4: newlines end sentences, CRLF is one break
    t3 = "One\r\nTwo"
    b3 = sentence_breaks(t3)
    assert [t3[s:e] for s, e in zip(b3, b3[1:])] == ["One\r\n", "Two"]


def test_iterator_surface():
    bi = SentenceBreakIterator(DOC1)
    assert bi.preceding(20) == 16
    assert bi.next() == 56
    assert bi.preceding(5) == 0
    bi.first()
    assert bi.current() == 0
