"""LanguageIdentifierUpdateProcessor twin (solr/contrib/langid).

Mirrors solr/contrib/langid/src/java/org/apache/solr/update/processor/
LanguageIdentifierUpdateProcessor.java — the ingest-time processor
that detects each document's language and routes text fields into
language-specific fields:

  * detection over the concatenation of `input_fields`
    (concatFields:288-304), written to `lang_field` unless it already
    holds a value and overwrite=False (process:199-223);
  * resolveLanguage (:331-358): top candidate, normalized through
    `lc_map` (langid.lcmap), rejected to the fallback when not in the
    whitelist or below the certainty threshold; fallback comes from
    the first non-empty `fallback_fields` value else `fallback_value`
    (getFallbackLang:270-283);
  * field mapping (:225-255): each `map_fields` field is renamed to
    getMappedField (:384-395) — `<field>_<lang>` by default, with
    map.pattern/map.replace and map.lcmap overrides; map_individual
    fields re-detect their own language with the doc language as
    fallback; map_keep_orig keeps the source field;
  * `langs_field` collects every language seen in the document.

The detector is the repo's trigram identifier
(datapipe/langid.py::detect_language) standing in for the Tika /
langdetect backends — same processor contract, different profiles.

Spark surface: `langid_process_df` runs the processor Arrow-batched
over a DataFrame; because Spark schemas are static, the mapped output
columns are `struct<lang, value>`-free: every `map_fields` column
gains a sibling `<col>__mapped` (the resolved target field name) so
a downstream pivot/writer can route values without a dynamic schema —
the per-doc dict surface (`process_doc`) keeps the reference's exact
dynamic-field behavior for row-level use.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class LangIdConfig:
    input_fields: list = field(default_factory=lambda: ["text"])
    lang_field: str = "language"
    langs_field: str | None = None
    overwrite: bool = False
    threshold: float = 0.5
    fallback_value: str | None = None
    fallback_fields: list = field(default_factory=list)
    whitelist: frozenset = frozenset()
    lc_map: dict = field(default_factory=dict)       # langid.lcmap
    map_enable: bool = False
    map_fields: list = field(default_factory=list)
    map_individual: frozenset = frozenset()
    map_keep_orig: bool = False
    map_pattern: str = r"^(.*)$"                     # langid.map.pattern
    map_replace: str = r"\1_{lang}"                  # langid.map.replace
    map_lcmap: dict = field(default_factory=dict)


def _resolve(candidates, fallback: str | None, cfg: LangIdConfig) -> str:
    """resolveLanguage (LanguageIdentifierUpdateProcessor.java:331-358)."""
    if not candidates:
        lang = fallback
    else:
        code, certainty = candidates[0]
        code = cfg.lc_map.get(code, code)
        if cfg.whitelist and code not in cfg.whitelist:
            lang = fallback
        elif certainty >= cfg.threshold:
            lang = code
        else:
            lang = fallback
    return lang or ""


def _fallback_lang(doc: dict, cfg: LangIdConfig) -> str | None:
    for f in cfg.fallback_fields:
        v = doc.get(f)
        if v:
            return str(v)
    return cfg.fallback_value


def mapped_field(current: str, lang: str, cfg: LangIdConfig) -> str:
    """getMappedField (:384-395): pattern/replace then language slot.
    Accepts Java-style ``$1`` group references alongside ``\\1``."""
    lc = cfg.map_lcmap.get(lang, lang)
    repl = cfg.map_replace.replace("{lang}", lc)
    repl = re.sub(r"\$(\d)", r"\\\1", repl)
    return re.sub(cfg.map_pattern, repl, current, count=1)


def process_doc(doc: dict, cfg: LangIdConfig, detect=None) -> dict:
    """SolrInputDocument-level processor (process:199-262); `doc` is a
    plain dict and a NEW dict is returned."""
    if detect is None:
        from ..datapipe.langid import detect_language
        detect = lambda t: [detect_language(t)] if t else []  # noqa: E731
    doc = dict(doc)
    doc_langs: list[str] = []
    fallback = _fallback_lang(doc, cfg)

    existing = doc.get(cfg.lang_field)
    if existing is None or cfg.overwrite:
        all_text = " ".join(str(doc.get(f) or "")
                            for f in cfg.input_fields).strip()
        doc_lang = _resolve(detect(all_text), fallback, cfg)
        if cfg.lang_field:
            doc[cfg.lang_field] = doc_lang
    else:
        # sanity-check the pre-set value against whitelist/threshold
        doc_lang = _resolve([(str(existing), 1.0)], fallback, cfg)
    doc_langs.append(doc_lang)

    if cfg.map_enable:
        for f in cfg.map_fields:
            if f not in doc or doc[f] is None:
                continue
            if f in cfg.map_individual:
                flang = _resolve(detect(str(doc[f])), doc_lang, cfg)
                doc_langs.append(flang)
            else:
                flang = doc_lang
            if not flang:
                # no language and no fallback: the reference REJECTS
                # the update (enforceSchema finds no '<field>_' target,
                # :249-252 throws BAD_REQUEST); without a schema we
                # skip the mapping and keep the field intact
                continue
            target = mapped_field(f, flang, cfg)
            doc[target] = doc[f]
            if not cfg.map_keep_orig and target != f:
                del doc[f]

    if cfg.langs_field:
        seen: list[str] = []
        for lg in doc_langs:
            if lg not in seen:
                seen.append(lg)
        doc[cfg.langs_field] = seen
    return doc


def langid_process_df(df, cfg: LangIdConfig):
    """Spark surface: adds `lang_field` (string) and, when mapping is
    on, `<col>__mapped` target-name columns for each map field —
    Arrow-batched (narrow map, detector loads once per executor)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    from ..datapipe.langid import detect_language

    def _detect(t):
        return [detect_language(t)] if t else []

    fb_fields = [f for f in cfg.fallback_fields if f in df.columns]
    n_inputs = len(cfg.input_fields)

    @F.pandas_udf(StringType())
    def _doclang(*cols):
        import pandas as pd
        out = []
        for vals in zip(*cols):
            inputs, fbs = vals[:n_inputs], vals[n_inputs:]
            fb = next((str(v) for v in fbs if v), cfg.fallback_value)
            text = " ".join(str(v) for v in inputs if v).strip()
            out.append(_resolve(_detect(text), fb, cfg))
        return pd.Series(out)

    @F.pandas_udf(StringType())
    def _sanity(*cols):
        # pre-existing langField, overwrite=False: resolve the stored
        # value through lcmap/whitelist like process_doc (:219)
        import pandas as pd
        existing, fbs = cols[0], cols[1:]
        out = []
        for vals in zip(existing, *fbs):
            ex = vals[0]
            fb = next((str(v) for v in vals[1:] if v), cfg.fallback_value)
            out.append(_resolve([(str(ex), 1.0)], fb, cfg)
                       if ex is not None else
                       _resolve([], fb, cfg))
        return pd.Series(out)

    fb_cols = [F.col(c) for c in fb_fields]
    if cfg.lang_field in df.columns and not cfg.overwrite:
        # pre-existing langField stays untouched (the reference's
        # :218-222 branch never writes it back); the sanity-resolved
        # value only drives field mapping
        out = df.withColumn("__resolved_lang",
                            _sanity(F.col(cfg.lang_field), *fb_cols))
    else:
        out = df.withColumn(
            cfg.lang_field,
            _doclang(*([F.col(c) for c in cfg.input_fields] + fb_cols))) \
            .withColumn("__resolved_lang", F.col(cfg.lang_field))
    if cfg.map_enable:
        # map_lcmap as a JVM-side CASE chain over the lang column
        lang_expr = F.col("__resolved_lang")
        mapped_lang = lang_expr
        for src, dst in cfg.map_lcmap.items():
            mapped_lang = F.when(lang_expr == src,
                                 F.lit(dst)).otherwise(mapped_lang)
        for f in cfg.map_fields:
            # the pattern/replace only touches the CONSTANT field name;
            # substitute a sentinel for the language slot, then splice
            # the mapped lang column between the constant halves
            tmpl = mapped_field(f, "\x00", LangIdConfig(
                map_pattern=cfg.map_pattern, map_replace=cfg.map_replace))
            pre, _, suf = tmpl.partition("\x00")
            out = out.withColumn(
                f + "__mapped",
                # empty resolved language: no target (NULL), matching
                # process_doc's skip-the-mapping behavior
                F.when(lang_expr == "", F.lit(None).cast("string"))
                .otherwise(F.concat(F.lit(pre), mapped_lang, F.lit(suf))))
    return out.drop("__resolved_lang")
