# ICUTransformFilter twin: vectors from lucene/analysis/icu/src/test/
# .../TestICUTransformFilter.java; table-driven transforms
# (Traditional-Simplified, Any-Latin, Han-Latin) are data-blocked and
# assert the clear NotImplementedError instead.
import pytest

from lucene_solr_1_spark.analysis.icutransform import (
    create_from_rules, get_instance, icu_transform_filter, register_rules)


def check(transform, inp, expected):
    assert icu_transform_filter([inp], transform) == [expected]


def test_custom_functionality():
    # TestICUTransformFilter.java:54-57: replacement output is not
    # re-keyed (cursor passes the replacement)
    t = create_from_rules("a > b; b > c;")
    check(t, "abacadaba", "bcbcbdbcb")


def test_custom_functionality2():
    # :59-62 — ante context matches already-produced text
    t = create_from_rules("c { a > b; a > d;")
    check(t, "caa", "cbd")


def test_optimizer_source_set():
    # :64-70: the filter's skip set is exactly the key chars
    t = create_from_rules("a > b; b > c;")
    assert t.source_set() == ((ord("a"), ord("b")),)


def test_optimizer_surrogate():
    # :78-84: a supplementary key lands in the set as one codepoint
    t = create_from_rules("\\U00020087 > x;")
    assert t.source_set() == ((0x20087, 0x20087),)


def test_optimizer_skips_unaffected_tokens():
    t = create_from_rules("a > b;")
    assert icu_transform_filter(["xyz", "za"], t) == ["xyz", "zb"]


def test_katakana_hiragana():
    check(get_instance("Katakana-Hiragana"), "ヒラガナ", "ひらがな")
    check(get_instance("Hiragana-Katakana"), "ひらがな", "ヒラガナ")


def test_fullwidth_halfwidth():
    check(get_instance("Fullwidth-Halfwidth"), "アルアノリウ", "ｱﾙｱﾉﾘｳ")
    check(get_instance("Fullwidth-Halfwidth"), "Ｔｅｓｔ　１２３", "Test 123")
    check(get_instance("Halfwidth-Fullwidth"), "ｱﾙｱﾉﾘｳ", "アルアノリウ")


def test_nfd_remove_marks():
    # :47-48 — compound ID with a filtered Remove segment
    t = get_instance("NFD; [:Nonspacing Mark:] Remove")
    check(t, "Alphabētikós Katálogos", "Alphabetikos Katalogos")


def test_casefold_compound():
    # the CaseFold leg of testOptimizer2 (:72-76); the
    # Traditional-Simplified leg is data-blocked
    check(get_instance("CaseFold"), "ABCDE", "abcde")


def test_data_blocked_raises_clearly():
    with pytest.raises(NotImplementedError):
        get_instance("Traditional-Simplified")
    with pytest.raises(NotImplementedError):
        get_instance("Any-Latin")


def test_register_rules_unblocks():
    # the data-pluggable path: rule text registered for a blocked ID
    register_rules("Traditional-Simplified", "簡 > 简; 化 > 化; 字 > 字;")
    try:
        t = get_instance("Traditional-Simplified; CaseFold")
        check(t, "簡化字ABC", "简化字abc")
    finally:
        from lucene_solr_1_spark.analysis import icutransform
        icutransform._REGISTERED_RULES.clear()


def test_variables_and_sets():
    t = create_from_rules("$v = [aeiou]; $v > '*';")
    check(t, "banana", "b*n*n*")


def test_cursor_reprocessing():
    # '|' places the cursor so the replacement IS re-keyed
    t = create_from_rules("a > | b; b > c;")
    check(t, "a", "c")


def test_quoted_and_escapes():
    t = create_from_rules("'>' > gt; \\u0041 > x;")
    check(t, "A>B", "xgtB")


def test_post_context():
    t = create_from_rules("a } b > x;")
    check(t, "ab aa", "xb aa")


def test_empty_term():
    t = get_instance("NFD")
    assert icu_transform_filter([""], t) == [""]
