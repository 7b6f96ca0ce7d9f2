# -*- coding: utf-8 -*-
"""Full-Unicode StandardTokenizer golden tests — the reference's own
multi-script cases (ref: lucene/analysis/common/src/test/org/apache/
lucene/analysis/core/TestStandardAnalyzer.java:58-115), VERDICT r2 #3:
each script's token stream must match the reference EXACTLY in both
the Python tokenizer (TOKEN_RE) and the JVM twin (JAVA_TOKEN_PATTERN
via regexp_extract_all)."""

import pytest

from lucene_solr_1_spark.analysis.standard import TOKEN_RE

# (script, input, expected tokens) — verbatim from the reference test
GOLDEN = [
    ("armenian",
     "Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն վիքիպեդիայում) "
     "գրվել են կամավորների կողմից ու համարյա բոլոր հոդվածները կարող է "
     "խմբագրել ցանկաց մարդ ով կարող է բացել Վիքիպեդիայի կայքը։",
     ["Վիքիպեդիայի", "13", "միլիոն", "հոդվածները", "4,600", "հայերեն",
      "վիքիպեդիայում", "գրվել", "են", "կամավորների", "կողմից", "ու",
      "համարյա", "բոլոր", "հոդվածները", "կարող", "է", "խմբագրել",
      "ցանկաց", "մարդ", "ով", "կարող", "է", "բացել", "Վիքիպեդիայի",
      "կայքը"]),
    ("amharic",
     "ዊኪፔድያ የባለ ብዙ ቋንቋ የተሟላ ትክክለኛና ነጻ መዝገበ ዕውቀት (ኢንሳይክሎፒዲያ) ነው። ማንኛውም",
     ["ዊኪፔድያ", "የባለ", "ብዙ", "ቋንቋ", "የተሟላ", "ትክክለኛና", "ነጻ", "መዝገበ",
      "ዕውቀት", "ኢንሳይክሎፒዲያ", "ነው", "ማንኛውም"]),
    ("arabic",
     "الفيلم الوثائقي الأول عن ويكيبيديا يسمى \"الحقيقة بالأرقام: قصة "
     "ويكيبيديا\" (بالإنجليزية: Truth in Numbers: The Wikipedia Story)، "
     "سيتم إطلاقه في 2008.",
     ["الفيلم", "الوثائقي", "الأول", "عن", "ويكيبيديا", "يسمى",
      "الحقيقة", "بالأرقام", "قصة", "ويكيبيديا", "بالإنجليزية",
      "Truth", "in", "Numbers", "The", "Wikipedia", "Story", "سيتم",
      "إطلاقه", "في", "2008"]),
    ("aramaic",
     "ܘܝܩܝܦܕܝܐ (ܐܢܓܠܝܐ: Wikipedia) ܗܘ ܐܝܢܣܩܠܘܦܕܝܐ ܚܐܪܬܐ ܕܐܢܛܪܢܛ "
     "ܒܠܫܢ̈ܐ ܣܓܝܐ̈ܐ܂ ܫܡܗ ܐܬܐ ܡܢ ܡ̈ܠܬܐ ܕ\"ܘܝܩܝ\" ܘ\"ܐܝܢܣܩܠܘܦܕܝܐ\"܀",
     ["ܘܝܩܝܦܕܝܐ", "ܐܢܓܠܝܐ", "Wikipedia", "ܗܘ", "ܐܝܢܣܩܠܘܦܕܝܐ", "ܚܐܪܬܐ",
      "ܕܐܢܛܪܢܛ", "ܒܠܫܢ̈ܐ", "ܣܓܝܐ̈ܐ", "ܫܡܗ", "ܐܬܐ", "ܡܢ", "ܡ̈ܠܬܐ",
      "ܕ", "ܘܝܩܝ", "ܘ", "ܐܝܢܣܩܠܘܦܕܝܐ"]),
    ("bengali",
     "এই বিশ্বকোষ পরিচালনা করে উইকিমিডিয়া ফাউন্ডেশন (একটি অলাভজনক সংস্থা)। "
     "উইকিপিডিয়ার শুরু ১৫ জানুয়ারি, ২০০১ সালে। এখন পর্যন্ত ২০০টিরও বেশী "
     "ভাষায় উইকিপিডিয়া রয়েছে।",
     ["এই", "বিশ্বকোষ", "পরিচালনা", "করে", "উইকিমিডিয়া", "ফাউন্ডেশন",
      "একটি", "অলাভজনক", "সংস্থা", "উইকিপিডিয়ার", "শুরু", "১৫",
      "জানুয়ারি", "২০০১", "সালে", "এখন", "পর্যন্ত", "২০০টিরও", "বেশী",
      "ভাষায়", "উইকিপিডিয়া", "রয়েছে"]),
    ("farsi",
     "ویکی پدیای انگلیسی در تاریخ ۲۵ دی ۱۳۷۹ به صورت مکملی برای "
     "دانشنامهٔ تخصصی نوپدیا نوشته شد.",
     ["ویکی", "پدیای", "انگلیسی", "در", "تاریخ", "۲۵", "دی", "۱۳۷۹",
      "به", "صورت", "مکملی", "برای", "دانشنامهٔ", "تخصصی", "نوپدیا",
      "نوشته", "شد"]),
    ("greek",
     "Γράφεται σε συνεργασία από εθελοντές με το λογισμικό wiki, κάτι "
     "που σημαίνει ότι άρθρα μπορεί να προστεθούν ή να αλλάξουν από τον "
     "καθένα.",
     ["Γράφεται", "σε", "συνεργασία", "από", "εθελοντές", "με", "το",
      "λογισμικό", "wiki", "κάτι", "που", "σημαίνει", "ότι", "άρθρα",
      "μπορεί", "να", "προστεθούν", "ή", "να", "αλλάξουν", "από",
      "τον", "καθένα"]),
    ("thai",
     "การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔",
     ["การที่ได้ต้องแสดงว่างานดี", "แล้วเธอจะไปไหน", "๑๒๓๔"]),
    ("lao",
     "ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ",
     ["ສາທາລະນະລັດ", "ປະຊາທິປະໄຕ", "ປະຊາຊົນລາວ"]),
    ("tibetan",
     "སྣོན་མཛོད་དང་ལས་འདིས་བོད་ཡིག་མི་ཉམས་གོང་འཕེལ་དུ་གཏོང་བར་ཧ་ཅང་དགེ་"
     "མཚན་མཆིས་སོ། །",
     ["སྣོན", "མཛོད", "དང", "ལས", "འདིས", "བོད", "ཡིག", "མི", "ཉམས",
      "གོང", "འཕེལ", "དུ", "གཏོང", "བར", "ཧ", "ཅང", "དགེ", "མཚན",
      "མཆིས", "སོ"]),
    ("chinese",
     "我是中国人。 １２３４ Ｔｅｓｔｓ ",
     ["我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ"]),
    # TestStandardAnalyzer.java:214-226 — ideographs/hiragana are
    # single-char tokens, katakana tokenizes as RUNS, hangul as runs.
    ("japanese",
     "仮名遣い カタカナ",
     ["仮", "名", "遣", "い", "カタカナ"]),
    ("korean",
     "훈민정음",
     ["훈민정음"]),
    # testSupplementary: U+29B05 (CJK ext B) is an <IDEOGRAPHIC> single
    ("supplementary",
     "𩬅艱鍟䇹愯瀛",
     ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]),
    # testCombiningMarks (TestStandardAnalyzer.java:228-233): U+3099
    # combining voiced mark attaches to hiragana/katakana/ideograph/
    # hangul hosts (WB4 Extend absorption)
    ("combining_hiragana", "ざ", ["ざ"]),
    ("combining_katakana", "ザ", ["ザ"]),
    ("combining_ideograph", "壹゙", ["壹゙"]),
    ("combining_hangul", "아゙", ["아゙"]),
    # katakana specials: halfwidth forms + prolonged sound mark join
    # runs (WB:Katakana); middle dot U+30FB splits (MidLetter, and we
    # don't implement katakana MidLetter joining)
    ("katakana_halfwidth", "ｶﾀｶﾅ ｻｰﾋﾞｽ", ["ｶﾀｶﾅ", "ｻｰﾋﾞｽ"]),
    ("katakana_prolonged", "コンピューター", ["コンピューター"]),
    ("katakana_middledot", "サン・テグジュペリ", ["サン", "テグジュペリ"]),
]


@pytest.mark.parametrize("script,text,expected",
                         GOLDEN, ids=[g[0] for g in GOLDEN])
def test_python_tokenizer_matches_reference(script, text, expected):
    assert TOKEN_RE.findall(text) == expected


def test_jvm_twin_matches_reference(spark):
    """The JVM regexp path must emit the identical streams (tokenizer
    only — no lowercase/stop — mirroring the reference test's bare
    StandardTokenizer analyzer)."""
    from pyspark.sql import functions as F

    from lucene_solr_1_spark.analysis.standard import JAVA_TOKEN_PATTERN
    df = spark.createDataFrame([(g[0], g[1]) for g in GOLDEN],
                               "script string, text string")
    got = {r["script"]: list(r["toks"]) for r in df.select(
        "script", F.regexp_extract_all(
            "text", F.lit(JAVA_TOKEN_PATTERN), 0).alias("toks")).collect()}
    for script, _text, expected in GOLDEN:
        assert got[script] == expected, script


def test_jvm_pattern_uses_category_classes_not_literal_ranges():
    """Perf guard (round-3 incident: a 313-literal-range class made a
    1-core build task ~50x slower — Java Pattern evaluates literal
    class unions as a chained predicate scan per character). The JVM
    twin's per-character hot classes must therefore be structured so a
    plain-ASCII character never reaches a literal range scan:

      * the mark/Extend class leads with category tests
        ([\\p{Mn}... ) whose residue ranges sit behind '&&' and are
        only evaluated when the category test PASSES — O(1) for every
        non-mark character;
      * the letter and digit classes lead with an ASCII fast path
        ([a-zA-Z... / [0-9...) so English text short-circuits before
        the category + residue nodes.

    Measured on the 500k-doc bench corpus: the exact-6.1 pattern runs
    ~0.75x the old subset pattern's time (interleaved A/B)."""
    from lucene_solr_1_spark.analysis.standard import JAVA_TOKEN_PATTERN
    from lucene_solr_1_spark.analysis.ubreak import MARK_CLASS
    assert "[\\p{Mn}\\p{Mc}\\p{Me}\\p{Cf}&&[^" in JAVA_TOKEN_PATTERN
    assert "[a-zA-Z[[\\p{L}\\p{Nl}&&[^" in JAVA_TOKEN_PATTERN
    assert "[0-9[[\\p{Nd}&&[^" in JAVA_TOKEN_PATTERN
    assert MARK_CLASS[:40] not in JAVA_TOKEN_PATTERN


# the SA behavioral sections (TestStandardAnalyzer.java:124-190):
# empty/punct-only, LUCENE-1545 combining latin, alphanumerics,
# delimiters, apostrophes, numerics, Korean SA
SA_GOLDEN = [
    ("empty", "", []),
    ("dot_only", ".", []),
    ("space_only", " ", []),
    ("lucene1545", "moͤchte", ["moͤchte"]),
    ("alnum_b2b", "B2B", ["B2B"]),
    ("alnum_2b", "2B", ["2B"]),
    ("dashes", "some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("commas", "dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("slash", "ac/dc", ["ac", "dc"]),
    ("apostrophe1", "O'Reilly", ["O'Reilly"]),
    ("apostrophe2", "you're", ["you're"]),
    ("apostrophe3", "O'Reilly's", ["O'Reilly's"]),
    ("float", "21.35", ["21.35"]),
    ("serials", "R2D2 C3PO", ["R2D2", "C3PO"]),
    ("ip", "216.239.63.104", ["216.239.63.104"]),
    ("mixed_nums", "David has 5000 bones",
     ["David", "has", "5000", "bones"]),
    ("various", "foo      bar .  FOO <> BAR",
     ["foo", "bar", "FOO", "BAR"]),
    ("quoted", "\"QUOTED\" word", ["QUOTED", "word"]),
    ("korean_sa", "안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
]


@pytest.mark.parametrize("name,text,expected",
                         SA_GOLDEN, ids=[g[0] for g in SA_GOLDEN])
def test_sa_sections_python(name, text, expected):
    assert TOKEN_RE.findall(text) == expected


def test_sa_sections_jvm(spark):
    """The same SA sections through the JVM regexp twin."""
    from pyspark.sql import functions as SF

    from lucene_solr_1_spark.analysis.standard import JAVA_TOKEN_PATTERN
    texts = [g[1] for g in SA_GOLDEN]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [list(r["toks"]) for r in
           df.select(SF.regexp_extract_all(
               "text", SF.lit(JAVA_TOKEN_PATTERN), 0).alias("toks"))
           .collect()]
    assert got == [g[2] for g in SA_GOLDEN]
