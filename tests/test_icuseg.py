# ICUTokenizer twin: reference test vectors from
# lucene/analysis/icu/src/test/.../segmentation/TestICUTokenizer.java,
# TestLaoBreakIterator.java, and TestICUTokenizerFactory.java.
import pytest

from lucene_solr_1_spark.analysis import icuseg, rbbi
from lucene_solr_1_spark.analysis.icu_norm import icu_normalize


def analyze(text):
    """ICUTokenizer + ICUNormalizer2Filter(nfkc_cf), the test analyzer
    at TestICUTokenizer.java:68-75."""
    return [icu_normalize(t[0], "nfkc_cf") for t in icuseg.tokenize(text)]


def toks(text, config=None):
    return icuseg.tokenize(text, config)


# ---------------------------------------------------------------- languages

def test_armenian():
    assert analyze(
        "Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն վիքիպեդիայում) "
        "գրվել են կամավորների կողմից ու համարյա բոլոր հոդվածները կարող է "
        "խմբագրել ցանկաց մարդ ով կարող է բացել Վիքիպեդիայի կայքը։") == [
        "վիքիպեդիայի", "13", "միլիոն", "հոդվածները", "4,600", "հայերեն",
        "վիքիպեդիայում", "գրվել", "են", "կամավորների", "կողմից", "ու",
        "համարյա", "բոլոր", "հոդվածները", "կարող", "է", "խմբագրել",
        "ցանկաց", "մարդ", "ով", "կարող", "է", "բացել", "վիքիպեդիայի",
        "կայքը"]


def test_amharic():
    assert analyze(
        "ዊኪፔድያ የባለ ብዙ ቋንቋ የተሟላ ትክክለኛና ነጻ መዝገበ ዕውቀት (ኢንሳይክሎፒዲያ) ነው። "
        "ማንኛውም") == [
        "ዊኪፔድያ", "የባለ", "ብዙ", "ቋንቋ", "የተሟላ", "ትክክለኛና", "ነጻ", "መዝገበ",
        "ዕውቀት", "ኢንሳይክሎፒዲያ", "ነው", "ማንኛውም"]


def test_arabic():
    assert analyze(
        "الفيلم الوثائقي الأول عن ويكيبيديا يسمى \"الحقيقة بالأرقام: قصة "
        "ويكيبيديا\" (بالإنجليزية: Truth in Numbers: The Wikipedia Story)، "
        "سيتم إطلاقه في 2008.") == [
        "الفيلم", "الوثائقي", "الأول", "عن", "ويكيبيديا", "يسمى", "الحقيقة",
        "بالأرقام", "قصة", "ويكيبيديا", "بالإنجليزية", "truth", "in",
        "numbers", "the", "wikipedia", "story", "سيتم", "إطلاقه", "في",
        "2008"]


def test_aramaic():
    assert analyze(
        "ܘܝܩܝܦܕܝܐ (ܐܢܓܠܝܐ: Wikipedia) ܗܘ ܐܝܢܣܩܠܘܦܕܝܐ ܚܐܪܬܐ ܕܐܢܛܪܢܛ ܒܠܫܢ̈ܐ "
        "ܣܓܝܐ̈ܐ܂ ܫܡܗ ܐܬܐ ܡܢ ܡ̈ܠܬܐ ܕ\"ܘܝܩܝ\" ܘ\"ܐܝܢܣܩܠܘܦܕܝܐ\"܀") == [
        "ܘܝܩܝܦܕܝܐ", "ܐܢܓܠܝܐ", "wikipedia", "ܗܘ", "ܐܝܢܣܩܠܘܦܕܝܐ", "ܚܐܪܬܐ",
        "ܕܐܢܛܪܢܛ", "ܒܠܫܢ̈ܐ", "ܣܓܝܐ̈ܐ", "ܫܡܗ", "ܐܬܐ", "ܡܢ", "ܡ̈ܠܬܐ", "ܕ",
        "ܘܝܩܝ", "ܘ", "ܐܝܢܣܩܠܘܦܕܝܐ"]


def test_bengali():
    assert analyze(
        "এই বিশ্বকোষ পরিচালনা করে উইকিমিডিয়া ফাউন্ডেশন (একটি অলাভজনক সংস্থা)। "
        "উইকিপিডিয়ার শুরু ১৫ জানুয়ারি, ২০০১ সালে। এখন পর্যন্ত ২০০টিরও বেশী "
        "ভাষায় উইকিপিডিয়া রয়েছে।") == [
        "এই", "বিশ্বকোষ", "পরিচালনা", "করে", "উইকিমিডিয়া", "ফাউন্ডেশন",
        "একটি", "অলাভজনক", "সংস্থা", "উইকিপিডিয়ার", "শুরু", "১৫",
        "জানুয়ারি", "২০০১", "সালে", "এখন", "পর্যন্ত", "২০০টিরও", "বেশী",
        "ভাষায়", "উইকিপিডিয়া", "রয়েছে"]


def test_farsi():
    assert analyze(
        "ویکی پدیای انگلیسی در تاریخ ۲۵ دی ۱۳۷۹ به صورت مکملی برای "
        "دانشنامهٔ تخصصی نوپدیا نوشته شد.") == [
        "ویکی", "پدیای", "انگلیسی", "در", "تاریخ", "۲۵", "دی", "۱۳۷۹", "به",
        "صورت", "مکملی", "برای", "دانشنامهٔ", "تخصصی", "نوپدیا", "نوشته",
        "شد"]


def test_greek():
    assert analyze(
        "Γράφεται σε συνεργασία από εθελοντές με το λογισμικό wiki, κάτι "
        "που σημαίνει ότι άρθρα μπορεί να προστεθούν ή να αλλάξουν από τον "
        "καθένα.") == [
        "γράφεται", "σε", "συνεργασία", "από", "εθελοντέσ", "με", "το",
        "λογισμικό", "wiki", "κάτι", "που", "σημαίνει", "ότι", "άρθρα",
        "μπορεί", "να", "προστεθούν", "ή", "να", "αλλάξουν", "από", "τον",
        "καθένα"]


def test_lao():
    assert analyze("ກວ່າດອກ") == ["ກວ່າ", "ດອກ"]


def test_thai():
    assert analyze("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔") == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี", "แล้ว",
        "เธอ", "จะ", "ไป", "ไหน", "๑๒๓๔"]


def test_tibetan():
    assert analyze(
        "སྣོན་མཛོད་དང་ལས་འདིས་བོད་ཡིག་མི་ཉམས་གོང་འཕེལ་དུ་གཏོང་བར་ཧ་ཅང་དགེ་"
        "མཚན་མཆིས་སོ། །") == [
        "སྣོན", "མཛོད", "དང", "ལས", "འདིས", "བོད", "ཡིག", "མི", "ཉམས",
        "གོང", "འཕེལ", "དུ", "གཏོང", "བར", "ཧ", "ཅང", "དགེ", "མཚན",
        "མཆིས", "སོ"]


def test_chinese():
    assert analyze("我是中国人。 １２３４ Ｔｅｓｔｓ ") == [
        "我", "是", "中", "国", "人", "1234", "tests"]


def test_empty():
    assert analyze("") == []
    assert analyze(".") == []
    assert analyze(" ") == []


def test_lucene1545():
    # U+0364 COMBINING LATIN SMALL LETTER E must not split the word
    assert analyze("moͤchte") == ["moͤchte"]


# ----------------------------------------------- StandardAnalyzer behavior

def test_alphanumeric_sa():
    assert analyze("B2B") == ["b2b"]
    assert analyze("2B") == ["2b"]


def test_delimiters_sa():
    assert analyze("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert analyze("dogs,chase,cats") == ["dogs", "chase", "cats"]
    assert analyze("ac/dc") == ["ac", "dc"]


def test_apostrophes_sa():
    assert analyze("O'Reilly") == ["o'reilly"]
    assert analyze("you're") == ["you're"]
    assert analyze("she's") == ["she's"]
    assert analyze("Jim's") == ["jim's"]
    assert analyze("don't") == ["don't"]
    assert analyze("O'Reilly's") == ["o'reilly's"]


def test_numeric_sa():
    assert analyze("21.35") == ["21.35"]
    assert analyze("R2D2 C3PO") == ["r2d2", "c3po"]
    assert analyze("216.239.63.104") == ["216.239.63.104"]


def test_text_with_numbers_sa():
    assert analyze("David has 5000 bones") == ["david", "has", "5000",
                                               "bones"]


def test_various_text_sa():
    assert analyze("C embedded developers wanted") == [
        "c", "embedded", "developers", "wanted"]
    assert analyze("foo bar FOO BAR") == ["foo", "bar", "foo", "bar"]
    assert analyze("foo      bar .  FOO <> BAR") == [
        "foo", "bar", "foo", "bar"]
    assert analyze("\"QUOTED\" word") == ["quoted", "word"]


def test_korean_sa():
    assert analyze("안녕하세요 한글입니다") == ["안녕하세요", "한글입니다"]


def test_offsets():
    ts = toks("David has 5000 bones")
    assert [t[0] for t in ts] == ["David", "has", "5000", "bones"]
    assert [t[1] for t in ts] == [0, 6, 10, 15]
    assert [t[2] for t in ts] == [5, 9, 14, 20]


def test_types():
    ts = toks("David has 5000 bones")
    assert [t[3] for t in ts] == ["<ALPHANUM>", "<ALPHANUM>", "<NUM>",
                                  "<ALPHANUM>"]


def test_korean_type():
    ts = toks("훈민정음")
    assert [(t[0], t[3]) for t in ts] == [("훈민정음", "<HANGUL>")]


def test_japanese_types():
    ts = toks("仮名遣い カタカナ")
    assert [(t[0], t[3]) for t in ts] == [
        ("仮", "<IDEOGRAPHIC>"), ("名", "<IDEOGRAPHIC>"),
        ("遣", "<IDEOGRAPHIC>"), ("い", "<HIRAGANA>"),
        ("カタカナ", "<KATAKANA>")]


def test_script_attribute():
    for t in toks("This is a test"):
        assert t[4] == "Latn"


def test_supplementary_offsets_utf16():
    # a supplementary ideograph (U+20000) occupies 2 UTF-16 units
    ts = toks("\U00020000 ab")
    assert ts[0][:3] == ("\U00020000", 0, 2)
    assert ts[1][:3] == ("ab", 3, 5)


# ---------------------------------------------------- LaoBreakIterator

def _lao_words(text):
    """assertBreaksTo + isWord (TestLaoBreakIterator.java:43-72): emit
    each segment whose FIRST codepoint is a letter or digit (the
    reference's isWord reads charAt(start) each loop iteration)."""
    bi = icuseg._LaoWrapper()
    cps = [ord(c) for c in text]
    bi.set_text(cps)
    out = []
    start = bi.current()
    while True:
        end = bi.next()
        if end == rbbi.DONE:
            break
        c = chr(bi._cps[start])
        if c.isalpha() or c.isdigit():
            out.append("".join(chr(x) for x in bi._cps[start:end]))
        start = end
    return out


def test_lao_basic_usage():
    assert _lao_words("ກວ່າດອກ") == ["ກວ່າ", "ດອກ"]
    assert _lao_words("ຜູ້​ເຂົ້າ") == ["ຜູ້", "ເຂົ້າ"]
    assert _lao_words("") == []
    assert _lao_words("ສະບາຍດີ") == ["ສະ", "ບາຍ", "ດີ"]


def test_lao_numerics():
    assert _lao_words("໐໑໒໓") == ["໐໑໒໓"]
    assert _lao_words("໐໑໒໓.໕໖") == ["໐໑໒໓.໕໖"]


def test_lao_text_and_numerics():
    assert _lao_words("ກວ່າດອກ໐໑໒໓") == ["ກວ່າ", "ດອກ", "໐໑໒໓"]


# ---------------------------------------------------- factory tailorings

def test_factory_mixed_text():
    ts = [t[0] for t in toks(
        "การที่ได้ต้องแสดงว่างานดี  This is a test ກວ່າດອກ")]
    assert ts == ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
                  "This", "is", "a", "test", "ກວ່າ", "ດອກ"]


def _tailored(mapping):
    src = icuseg.rule_sources()
    return icuseg.ICUTokenizerConfig(
        rulefiles={k: src[v] for k, v in mapping.items()})


def test_factory_latin_on_whitespace_only():
    cfg = _tailored({"Latn": "Latin-break-only-on-whitespace"})
    ts = toks("  Don't,break.at?/(punct)!  “nice”\r\n\r\n"
              "85_At:all; `really\" +2=3$5,&813 !@#%$^)(*@#$   ", cfg)
    assert [t[0] for t in ts] == [
        "Don't,break.at?/(punct)!", "“nice”", "85_At:all;",
        "`really\"", "+2=3$5,&813", "!@#%$^)(*@#$"]
    assert [t[3] for t in ts] == [
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<NUM>",
        "<OTHER>"]


def test_factory_latin_dont_break_on_hyphens():
    cfg = _tailored({"Latn": "Latin-dont-break-on-hyphens"})
    ts = toks("One-two punch.  Brang-, not brung-it.  "
              "This one--not that one--is the right one, -ish.", cfg)
    assert [t[0] for t in ts] == [
        "One-two", "punch", "Brang", "not", "brung-it", "This", "one",
        "not", "that", "one", "is", "the", "right", "one", "ish"]


def test_factory_keyword_cyrillic_and_thai():
    cfg = _tailored({"Cyrl": "KeywordTokenizer",
                     "Thai": "KeywordTokenizer"})
    ts = toks("Some English.  Немного русский.  "
              "ข้อความภาษาไทยเล็ก ๆ น้อย ๆ  More English.", cfg)
    assert [t[0] for t in ts] == [
        "Some", "English", "Немного русский.  ",
        "ข้อความภาษาไทยเล็ก ๆ น้อย ๆ  ", "More", "English"]


def test_unknown_script_raises():
    with pytest.raises(KeyError):
        icuseg.ICUTokenizerConfig(
            rulefiles={"Bogus": icuseg.rule_sources()["KeywordTokenizer"]})


# ------------------------------------ cross-validation vs jflex twin

def test_fuzz_parity_vs_standard_tokenizer():
    """Default.rbbi and the probed jflex StandardTokenizer implement
    the same UAX#29 grammar (same tailorings — see uniprops.py), so on
    single-script words they must emit identical token streams.  They
    legitimately DIVERGE on mixed-script words: ICUTokenizer segments
    per script run first (CompositeBreakIterator), so "ЖX" is two
    tokens for ICU and one for StandardTokenizer — by design, hence
    the word pools here are single-script."""
    import random

    import pandas as pd

    from lucene_solr_1_spark.analysis.standard import tokenize_series

    pools = [
        "hello world don't 21.35 B2B foo.bar U.S.A 1,234 x.y.org",
        "Вики педия русский текст слово",
        "Γράφεται συνεργασία εθελοντές",
        "الفيلم الوثائقي الأول",
        "仮名遣い カタカナ ひらがな 漢字",
        "한국어 단어 조합",
        "Վիքիպեդիա միլիոն",
        "ዊኪፔድያ የባለ ብዙ",
    ]
    words = " ".join(pools).split()
    rng = random.Random(123)
    texts = [" ".join(rng.choice(words)
                      for _ in range(rng.randrange(1, 12)))
             for _ in range(500)]
    std = tokenize_series(pd.Series(texts))
    mismatches = 0
    for text, expect in zip(texts, std):
        got = [t[0] for t in icuseg.tokenize(text, utf16_offsets=False)]
        if got != list(expect):
            mismatches += 1
    assert mismatches == 0


# ---------------------------------------------------- batch kernel

def test_series_kernel():
    import pandas as pd
    s = pd.Series(["David has 5000 bones", "我是中国人"])
    out = icuseg.icu_tokenize_series(s)
    assert out[0] == ["David", "has", "5000", "bones"]
    assert out[1] == ["我", "是", "中", "国", "人"]
