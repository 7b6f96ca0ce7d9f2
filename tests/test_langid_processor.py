# LanguageIdentifierUpdateProcessor twin: behaviors from solr/contrib/
# langid/src/test/.../LanguageIdentifierUpdateProcessorFactoryTestCase.java
from lucene_solr_1_spark.solr.langid_processor import (LangIdConfig,
                                                       _resolve,
                                                       mapped_field,
                                                       process_doc)


def cfg(**kw):
    return LangIdConfig(**kw)


# ---------------------------------------------------- getMappedField

def test_map_field_name():
    # testMapFieldName:92-116
    c = cfg(map_lcmap={"jp": "s", "zh": "cjk", "ko": "cjk"})
    assert mapped_field("test", "no", c) == "test_no"
    assert mapped_field("test", "en", c) == "test_en"
    assert mapped_field("test", "jp", c) == "test_s"
    assert mapped_field("test", "zh", c) == "test_cjk"
    assert mapped_field("test", "ko", c) == "test_cjk"
    # custom pattern with Java-style $1 references
    c2 = cfg(map_pattern=r"text_(.*?)_field", map_replace=r"$1_{lang}_s")
    assert mapped_field("text_title_field", "no", c2) == "title_no_s"
    assert mapped_field("text_body_field", "sv", c2) == "body_sv_s"


# ---------------------------------------------------- resolveLanguage

def test_map_langcode():
    # testMapLangcode:119-132 (langid.lcmap normalization)
    c = cfg(lc_map={"zh_cn": "zh", "zh_tw": "zh"})
    assert _resolve([("zh_cn", 1.0)], "NA", c) == "zh"
    assert _resolve([("zh_tw", 1.0)], "NA", c) == "zh"
    assert _resolve([("no", 1.0)], "NA", c) == "no"
    assert _resolve([("zh_cn", 0.8)], "NA", c) == "zh"


def test_resolve_language():
    # testResolveLanguage:191-212
    c = cfg()
    assert _resolve([], None, c) == ""
    assert _resolve([], "fallback", c) == "fallback"
    assert _resolve([("one", 1.0)], "fallback", c) == "one"
    # under the default 0.5 threshold -> fallback
    assert _resolve([("under", 0.1)], "fallback", c) == "fallback"


def test_whitelist():
    c = cfg(whitelist=frozenset(["en", "no"]))
    assert _resolve([("sv", 1.0)], "fb", c) == "fb"
    assert _resolve([("no", 1.0)], "fb", c) == "no"


# ---------------------------------------------------- process(doc)

def _stub_detect(lang, certainty=1.0):
    return lambda t: [(lang, certainty)] if t else []


def test_pre_existing_not_overwritten():
    # testPreExisting:135-152 — existing langField survives, and goes
    # through whitelist sanity checking
    c = cfg(input_fields=["text"], lang_field="language")
    doc = {"text": "whatever", "language": "en"}
    out = process_doc(doc, c, detect=_stub_detect("no"))
    assert out["language"] == "en"
    c2 = cfg(input_fields=["text"], lang_field="language", overwrite=True)
    out2 = process_doc(doc, c2, detect=_stub_detect("no"))
    assert out2["language"] == "no"


def test_fallback_fields_then_value():
    # testFallback:168-187 — first non-empty fallback field wins, else
    # the fallback value; detection below threshold triggers it
    c = cfg(input_fields=["text"], fallback_fields=["noop", "fb"],
            fallback_value="fbVal")
    doc = {"text": "This text is too short", "fb": "fbField"}
    out = process_doc(doc, c, detect=_stub_detect("en", 0.1))
    assert out["language"] == "fbField"
    doc2 = {"text": "This text is too short"}
    out2 = process_doc(doc2, c, detect=_stub_detect("en", 0.1))
    assert out2["language"] == "fbVal"


def test_default_fallback_empty_string():
    # testDefaultFallbackEmptyString:155-166
    c = cfg(input_fields=["text"])
    out = process_doc({"text": "too short"}, c,
                      detect=_stub_detect("en", 0.1))
    assert out["language"] == ""


def test_field_mapping_and_langs_field():
    c = cfg(input_fields=["text"], langs_field="languages",
            map_enable=True, map_fields=["text", "title"],
            map_individual=frozenset(["title"]), map_keep_orig=False)

    def detect(t):
        return [("no", 1.0)] if "norsk" in t else [("en", 1.0)]

    doc = {"text": "english body", "title": "norsk tittel"}
    out = process_doc(doc, c, detect=detect)
    assert out["language"] == "en"
    assert out["text_en"] == "english body"
    assert "text" not in out
    assert out["title_no"] == "norsk tittel"
    assert out["languages"] == ["en", "no"]


def test_map_keep_orig():
    c = cfg(input_fields=["text"], map_enable=True, map_fields=["text"],
            map_keep_orig=True)
    out = process_doc({"text": "hello"}, c, detect=_stub_detect("en"))
    assert out["text"] == "hello" and out["text_en"] == "hello"


# ------------------------------------- real detector, reference texts

def test_langid_global_with_real_detector():
    # testLangIdGlobal:60-90, restricted to the languages the trigram
    # profiles cover; threshold lowered to the detector's margin scale
    from lucene_solr_1_spark.datapipe.langid import detect_language
    c = cfg(input_fields=["name", "subject"], threshold=0.0)
    det = lambda t: [detect_language(t)] if t else []  # noqa: E731
    cases = {
        "en": "Apache Lucene is a free/open source information retrieval "
              "software library, originally created in Java by Doug "
              "Cutting. It is supported by the Apache Software Foundation "
              "and is released under the Apache Software License.",
        "de": "Lucene ist ein Freie-Software-Projekt der Apache Software "
              "Foundation, das eine Suchsoftware erstellt. Durch die hohe "
              "Leistungsfähigkeit und Skalierbarkeit können die "
              "Lucene-Werkzeuge für beliebige Projektgrößen und "
              "Anforderungen eingesetzt werden.",
        "fr": "Lucene est un moteur de recherche libre écrit en Java qui "
              "permet d'indexer et de rechercher du texte. C'est un "
              "projet open source de la fondation Apache mis à "
              "disposition sous licence Apache. Il est également "
              "disponible pour les langages Ruby, Perl, C++, PHP.",
        "ru": "The Apache Lucene — это свободная библиотека для "
              "высокоскоростного полнотекстового поиска, написанная на "
              "Java. Может быть использована для поиска в интернете и "
              "других областях компьютерной лингвистики.",
        "sv": "Apache Maven är ett verktyg utvecklat av Apache Software "
              "Foundation och används inom systemutveckling av "
              "datorprogram i programspråket Java.",
        "it": "Lucene è una API gratuita ed open source per il "
              "reperimento di informazioni inizialmente implementata in "
              "Java da Doug Cutting.",
        "nl": "Lucene is een gratis open source, tekst gebaseerde "
              "information retrieval API van origine geschreven in Java "
              "door Doug Cutting.",
        "pt": "Apache Lucene, ou simplesmente Lucene, é um software de "
              "busca e uma API de indexação de documentos, escrito na "
              "linguagem de programação Java.",
    }
    for lang, subject in cases.items():
        out = process_doc({"name": "Lucene", "subject": subject}, c,
                          detect=det)
        assert out["language"] == lang, (lang, out["language"])


def test_empty_language_skips_mapping():
    # no detection + no fallback: the mapping is skipped (the
    # reference would reject the update; we keep the field intact)
    c = cfg(input_fields=["body"], map_enable=True, map_fields=["title"])
    doc = {"body": "", "title": "keep me"}
    out = process_doc(doc, c, detect=lambda t: [])
    assert out["title"] == "keep me"
    assert "title_" not in out


# ------------------------------------------------------ Spark surface

def test_spark_surface(spark):
    c = cfg(input_fields=["text"], threshold=0.0, map_enable=True,
            map_fields=["text"], map_lcmap={"no": "scandinavian"})
    df = spark.createDataFrame(
        [(1, "Apache Lucene is a free open source information retrieval "
             "software library created in Java by Doug Cutting and the "
             "Apache Software Foundation for the community")],
        "doc_id long, text string")
    from lucene_solr_1_spark.solr.langid_processor import langid_process_df
    row = langid_process_df(df, c).collect()[0]
    assert row.language == "en"
    assert row.text__mapped == "text_en"


def test_spark_surface_preexisting_and_fallback_fields(spark):
    from lucene_solr_1_spark.solr.langid_processor import langid_process_df
    # pre-existing language column, overwrite=False: kept verbatim,
    # mapping driven by the whitelist-resolved value
    c = cfg(input_fields=["text"], whitelist=frozenset(["en"]),
            fallback_value="en", map_enable=True, map_fields=["text"])
    df = spark.createDataFrame([(1, "whatever", "de")],
                               "doc_id long, text string, language string")
    row = langid_process_df(df, c).collect()[0]
    assert row.language == "de"          # stored value untouched
    assert row.text__mapped == "text_en"  # mapping uses resolved lang
    # fallback fields consulted on the Spark surface too
    c2 = cfg(input_fields=["text"], threshold=2.0,  # force fallback
             fallback_fields=["site_lang"])
    df2 = spark.createDataFrame([(1, "hello world text", "no")],
                                "doc_id long, text string, site_lang string")
    row2 = langid_process_df(df2, c2).collect()[0]
    assert row2.language == "no"
