"""Function queries — the ValueSource expression library as Columns.

Reference: lucene/queries function module (FunctionQuery over ValueSource
trees; 47 sources including sum, product, div, pow, linear, recip,
scale, max, min, if, def, ord, tf, idf, docfreq, maxdoc, query(...) —
ref: lucene/queries/src/java/org/apache/lucene/queries/function/).
In Spark these are ordinary Column expressions (Catalyst folds constants
and codegen's them); this module provides the named registry so Solr
`func`-style strings map 1:1, plus `boost_by` to combine a relevance
score with a function value (the boost/bf parameter of dismax).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

VALUE_SOURCES = {
    "sum": lambda *a: sum(a[1:], a[0]),
    "sub": lambda a, b: a - b,
    "product": lambda *a: __import__("functools").reduce(lambda x, y: x * y, a),
    "div": lambda a, b: a / b,
    "pow": F.pow,
    "sqrt": F.sqrt,
    "log": F.log10,
    "ln": lambda a: F.log(a),
    "abs": F.abs,
    "linear": lambda x, m, c: x * m + c,
    "recip": lambda x, m, a, b: a / (F.lit(m) * x + F.lit(b)),
    "scale": None,  # needs min/max aggregates; see scale()
    "max": F.greatest,
    "min": F.least,
    "if": lambda c, a, b: F.when(c, a).otherwise(b),
    "def": lambda a, d: F.coalesce(a, d),
    "exists": lambda a: a.isNotNull(),
    "ms": lambda a, b: (a.cast("double") - b.cast("double")) * 1000.0,
    # the DoubleParser math block (ValueSourceParser.java static init)
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "ceil": F.ceil, "floor": F.floor, "rint": F.rint,
    "exp": F.exp, "cbrt": F.cbrt,
    "deg": F.degrees, "rad": F.radians,
    "atan2": F.atan2, "hypot": F.hypot,
    "pi": lambda: F.lit(3.141592653589793),
    "e": lambda: F.lit(2.718281828459045),
    "true": lambda: F.lit(True), "false": lambda: F.lit(False),
    "not": lambda a: ~a.cast("boolean"),
    "and": lambda *a: __import__("functools").reduce(
        lambda x, y: x.cast("boolean") & y.cast("boolean"), a),
    "or": lambda *a: __import__("functools").reduce(
        lambda x, y: x.cast("boolean") | y.cast("boolean"), a),
    "xor": lambda a, b: a.cast("boolean") != b.cast("boolean"),
    "mod": lambda a, b: a % b,
    # map(x,min,max,target[,def]): ValueSourceParser "map"
    "map": lambda x, mn, mx, tgt, dflt=None: F.when(
        (x >= mn) & (x <= mx), tgt).otherwise(x if dflt is None else dflt),
    # geodist/dist family (haversine in km like geodist())
    "hsin": lambda radius, lat1, lon1, lat2, lon2: radius * 2 * F.asin(
        F.sqrt(F.pow(F.sin((F.radians(lat2) - F.radians(lat1)) / 2), 2)
               + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
               * F.pow(F.sin((F.radians(lon2) - F.radians(lon1)) / 2), 2))),
    "sqedist": lambda *a: sum(
        (F.pow(a[i] - a[i + len(a) // 2], 2)
         for i in range(1, len(a) // 2)),
        F.pow(a[0] - a[len(a) // 2], 2)),
    "dist": lambda p, *a: F.pow(
        sum((F.pow(F.abs(a[i] - a[i + len(a) // 2]), p)
             for i in range(1, len(a) // 2)),
            F.pow(F.abs(a[0] - a[len(a) // 2]), p)),
        F.lit(1.0) / p),
    "strdist": lambda a, b, m="edit", n=2: _strdist(a, b, m, n),
    # field('name') / field(bare-id): the parser already resolves bare
    # identifiers to Columns, so accept either
    "field": lambda name: F.col(name) if isinstance(name, str) else name,
}


def _strdist(a, b, measure="edit", n=2):
    """strdist(s1,s2,measure[,n]) — the reference's full measure set
    (ref: solr/core/.../search/ValueSourceParser.java:351-375):
    'edit' = LevensteinDistance (JVM levenshtein expression, stays in
    codegen), 'jw' = JaroWinklerDistance, 'ngram' = NGramDistance(n)
    (both reference-exact via solr/spelldist.py, Arrow-batched)."""
    a = F.lit(a) if isinstance(a, str) else a
    b = F.lit(b) if isinstance(b, str) else b
    if measure == "edit":
        mx = F.greatest(F.length(a), F.length(b))
        return F.when(mx == 0, F.lit(1.0)).otherwise(
            1.0 - F.levenshtein(a, b) / mx.cast("double"))
    if measure in ("jw", "ngram"):
        from ..solr.spelldist import pair_distance_udf
        if hasattr(n, "cast"):
            # the parser lits numbers; recover the ngram size literal
            import re as _re
            m = _re.match(r"Column<'(\d+(?:\.\d+)?)'>", repr(n))
            n = int(float(m.group(1))) if m else 2
        udf = pair_distance_udf(
            "jarowinkler" if measure == "jw" else "ngram", int(n))
        return udf(a, b)
    raise ValueError(f"strdist measure {measure!r} not supported "
                     "(edit | jw | ngram)")


def fn(name: str, *args) -> Column:
    """Look up a ValueSource by its Solr function name."""
    f = VALUE_SOURCES.get(name)
    if f is None:
        raise KeyError(f"unknown or aggregate-backed function source: {name}")
    return f(*args)


def parse_func_expr(s: str, sources: dict | None = None) -> Column:
    """Parse Solr function-query syntax into a Column (ref: solr/core/
    src/java/org/apache/solr/search/FunctionQParser.java:parseValueSource
    — the string entry point behind {!func} and {!frange}).

    Grammar: number | 'string' | field | name(arg, ...). Function names
    resolve against `sources` (e.g. searcher_sources for idf/docfreq/
    maxdoc) first, then the stock VALUE_SOURCES registry; bare
    identifiers become field Columns; quoted strings stay Python str
    (term arguments of the stat sources). Everything folds into one
    Catalyst expression — no Python at execution time."""
    import re

    toks = re.findall(
        r"[A-Za-z_][\w.]*|-?\d+\.?\d*(?:[eE]-?\d+)?|'[^']*'|\"[^\"]*\"|[(),]",
        s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def advance():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def value():
        t = advance()
        if t in "(),":
            raise ValueError(f"unexpected {t!r} in function query {s!r}")
        if t[0] in "'\"":
            return t[1:-1]
        if re.match(r"^-?\d", t):
            return F.lit(float(t))
        if peek() == "(":
            advance()
            args = []
            if peek() != ")":
                args.append(value())
                while peek() == ",":
                    advance()
                    args.append(value())
            if advance() != ")":
                raise ValueError(f"unbalanced parens in {s!r}")
            f = (sources or {}).get(t) or VALUE_SOURCES.get(t)
            if f is None:
                raise KeyError(f"unknown function source: {t}")
            res = f(*args)
            if isinstance(res, DataFrame):
                # e.g. searcher_sources()['norm']: per-doc stats are
                # join-style DataFrames, not foldable Columns (ADVICE
                # r3: this used to surface as an opaque AttributeError
                # deep inside {!func}/{!frange}/boost)
                raise ValueError(
                    f"function source {t!r} yields a per-doc DataFrame "
                    "(join-style API, e.g. norm_source); it cannot be "
                    "folded into a function-query expression")
            return res
        return F.col(t)

    col = value()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in function query {s!r}")
    return col


def scale(df: DataFrame, col: Column, lo: float, hi: float) -> Column:
    """scale(x, lo, hi): min/max computed in one agg pass (ValueSource
    `scale` caches per-reader min/max the same way)."""
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
    mn, mx = float(row["mn"]), float(row["mx"])
    if mx == mn:
        return F.lit(lo)
    return (col - F.lit(mn)) / F.lit(mx - mn) * F.lit(hi - lo) + F.lit(lo)


def boost_by(scored: DataFrame, func: Column, mode: str = "multiply") -> DataFrame:
    """FunctionQuery boost: combine relevance score with a function value
    (Solr boost= / bf=). mode: multiply | sum."""
    combined = (F.col("score") * func if mode == "multiply"
                else F.col("score") + func)
    return scored.withColumn("score", combined)


def searcher_sources(searcher) -> dict:
    """Searcher-bound ValueSources (ref: queries/.../function/valuesource/
    IDFValueSource.java, DocFreqValueSource.java, MaxDocValueSource.java,
    TotalTermFreqValueSource.java, NormValueSource.java): index-statistic
    functions. Stats resolve driver-side to literal Columns (the
    reference caches them per-reader in createWeight the same way);
    norm(field) is a per-doc column joined from the docs table."""
    import numpy as np

    from .bm25 import idf as bm25_idf

    def _stat(term: str, col: str) -> float:
        st = searcher.term_stats([term])
        return int(st[col].iloc[0]) if len(st) else 0

    return {
        "maxdoc": lambda: F.lit(searcher.max_doc),
        "docfreq": lambda t: F.lit(_stat(t, "df")),
        "totaltermfreq": lambda t: F.lit(_stat(t, "ttf")),
        "idf": lambda t: F.lit(float(bm25_idf(_stat(t, "df"),
                                              searcher.max_doc,
                                              dtype=np.float32))),
        # norm is PER-DOC (lives in the postings blobs, not the docs
        # table): materialized as a (docid, norm) DataFrame to join —
        # see norm_source below
        "norm": lambda field=None: norm_source(searcher, field),
    }


def norm_source(searcher, field: str | None = None) -> DataFrame:
    """norm(field) ValueSource (ref: queries/.../valuesource/
    NormValueSource.java:44: similarity.decodeNormValue(norms.get(doc))).

    Norms are packed per-posting inside the blobs, so there is no
    per-doc norm column to read directly; this recomputes dl with the
    same JVM-side analyzer expression the build used and runs it
    through the identical SmallFloat-315 encode/decode roundtrip —
    bit-equal to decoding the stored byte. Returns DataFrame(docid,
    norm float32) for the caller to join (defVal pattern: left join +
    coalesce). One scan over the docs table, no shuffle."""
    import pandas as pd

    from ..analysis.standard import analyze_expr
    from ..index.smallfloat import byte315_to_float, encode_norm

    col = field or getattr(searcher, "default_field", None) or "text"

    def _norm_fn(dl):
        import numpy as np
        b = encode_norm(dl.to_numpy(np.float32))
        return pd.Series(byte315_to_float(b))

    _norm = F.pandas_udf(_norm_fn, "float")

    docs = searcher.spark.read.parquet(searcher.paths.docs)
    return docs.select("docid",
                       _norm(F.size(analyze_expr(F.col(col)))).alias("norm"))


def query_source(searcher, terms, op: str = "OR") -> DataFrame:
    """query(...) ValueSource (QueryValueSource.java): the score of an
    arbitrary inner query as a per-doc value — returned as a
    DataFrame(docid, qscore) to join (left join + coalesce(qscore, 0)
    reproduces the defVal=0 contract)."""
    inner = searcher.search(terms, op, k=2**31 - 1)
    return inner.select("docid", F.col("score").alias("qscore"))
