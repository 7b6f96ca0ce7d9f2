"""Pluggable Similarity models — the engine analog of Lucene's
``Similarity`` extension point (ref: lucene/core/src/java/org/apache/
lucene/search/similarities/Similarity.java; per-field wrapping via
PerFieldSimilarityWrapper.java — SURVEY.md §2.I).

Three models, matching the reference formulas stage-for-stage:

* ``BM25`` — BM25Similarity.java (the engine default; kernels in
  ``bm25.py``, float32 discipline documented there).
* ``Classic`` — DefaultSimilarity.java (the Lucene **4.4 default**):
    tf        = (float) sqrt(freq)                     [:120-122]
    idf       = (float)(ln(numDocs/(double)(df+1)) + 1)[:138-140]
    queryNorm = (float)(1/sqrt(Σ (idf·boost)²))        [:67-69]
    weight    = (idf · queryNorm) · idf                (TFIDFSimilarity
                IDFStats.normalize :761-763, value = queryWeight·idf)
    norm      = byte315ToFloat(normByte)  (≈ 1/sqrt(dl), decodeNormValue
                DefaultSimilarity.java:96-97)
    score_t   = tf · weight · norm                     (TFIDFSimilarity
                ExactTFIDFDocScorer.score :713-716)
    coord     = overlap / (float) maxOverlap           [:61-63] —
                multiplies the per-doc clause-score sum.
* ``LMDirichlet`` — LMDirichletSimilarity.java (µ defaults to 2000):
    p         = (ttf + 1f) / (sumTotalTermFreq + 1f)   (LMSimilarity
                DefaultCollectionModel.computeProbability :153-155)
    docLen    = 1/f(normByte)²  (SimilarityBase NORM_TABLE :220-225)
    score_t   = max(0, (float)(ln(1 + tf/(µ·p)) + ln(µ/(docLen+µ))))
                                                       [:65-69]
    coord     = 1 (SimilarityBase).

The engine and the NumPy oracle share these kernels; the distributed
path is tested rank- and score-identical to the single-process oracle
(the TestBoolean2 pattern). Cross-term combination uses the engine's
float32 left-to-right scatter-add convention (see search/engine.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..index.smallfloat import NORM_INV_TABLE, byte315_to_float
from .bm25 import make_weight, score_postings

__all__ = ["Similarity", "BM25", "Classic", "LMDirichlet", "LMJelinekMercer",
           "DFR_InL2", "IB", "IB_SPL", "IB_LL", "get_similarity"]


class Similarity:
    """Per-query scoring model. ``make_weights`` binds collection +
    term statistics into per-term scorers (Lucene's Weight creation,
    IndexSearcher.createNormalizedWeight); ``coord`` is the multiplier
    applied to a doc's clause-score sum given its match overlap."""

    name = "base"

    def make_weights(self, terms: list[str], stats: pd.DataFrame,
                     max_doc: int, sum_ttf: int, dtype=np.float32) -> dict:
        raise NotImplementedError

    def coord(self, overlap: int, max_overlap: int, dtype=np.float32):
        return dtype(1.0)

    def uses_coord(self) -> bool:
        return False


@dataclass
class _SimWeight:
    """score(tfs, norms) for one term; max_score bounds any posting."""

    term: str
    df: int
    score: callable
    max_score: float


class BM25(Similarity):
    """BM25Similarity (k1=1.2, b=0.75): queryNorm = coord = 1."""

    name = "bm25"

    def make_weights(self, terms, stats, max_doc, sum_ttf, dtype=np.float32):
        from .bm25 import avg_field_length
        st = stats.set_index("term") if len(stats) else stats
        avgdl = avg_field_length(sum_ttf, max_doc, dtype=dtype)
        out = {}
        for t in terms:
            if len(stats) and t in st.index:
                tw = make_weight(t, int(st.loc[t, "df"]), max_doc, avgdl,
                                 int(st.loc[t, "max_tf"]), dtype=dtype)
                out[t] = _SimWeight(
                    t, tw.df,
                    (lambda tw: lambda tf, nb: score_postings(tw, tf, nb, dtype=dtype))(tw),
                    float(tw.max_score))
        return out


class Classic(Similarity):
    """DefaultSimilarity — the Lucene 4.4 default TF-IDF (file refs in
    module docstring). queryNorm couples the per-term weights, so all
    query terms are bound together here."""

    name = "classic"

    def make_weights(self, terms, stats, max_doc, sum_ttf, dtype=np.float32):
        st = stats.set_index("term") if len(stats) else stats
        present = [t for t in terms if len(stats) and t in st.index]
        # idf in double, cast to float per term (DefaultSimilarity.java:138-140)
        idfs = {t: dtype(np.log(max_doc / np.float64(int(st.loc[t, "df"]) + 1)) + 1.0)
                for t in present}
        # sumOfSquaredWeights: float accumulation left-to-right in query
        # order (BooleanWeight.getValueForNormalization sums clause floats)
        ssw = dtype(0.0)
        for t in terms:
            if t in idfs:
                ssw = dtype(ssw + dtype(idfs[t] * idfs[t]))
        qnorm = dtype(1.0 / np.sqrt(np.float64(ssw))) if ssw > 0 else dtype(1.0)
        decode = byte315_to_float(np.arange(256, dtype=np.uint8)).astype(dtype)
        out = {}
        for t in present:
            idf_t = idfs[t]
            # normalize(): queryWeight = idf*queryNorm; value = queryWeight*idf
            value = dtype(dtype(idf_t * qnorm) * idf_t)

            def _score(tf, nb, value=value):
                tff = np.sqrt(tf.astype(dtype)).astype(dtype)  # tf=(float)sqrt(freq)
                raw = (tff * value).astype(dtype)
                return (raw * decode[np.asarray(nb, np.uint8)]).astype(dtype)

            max_tf = int(st.loc[t, "max_tf"])
            out[t] = _SimWeight(t, int(st.loc[t, "df"]), _score,
                                float(np.sqrt(max_tf) * value * decode[255]))
        return out

    def coord(self, overlap, max_overlap, dtype=np.float32):
        return dtype(np.float64(overlap) / np.float64(dtype(max_overlap)))

    def uses_coord(self) -> bool:
        return True


class LMDirichlet(Similarity):
    """LMDirichletSimilarity with Bayesian (Dirichlet) smoothing."""

    name = "lm_dirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def make_weights(self, terms, stats, max_doc, sum_ttf, dtype=np.float32):
        st = stats.set_index("term") if len(stats) else stats
        mu = dtype(self.mu)
        doclen = NORM_INV_TABLE.astype(dtype)  # SimilarityBase NORM_TABLE=1/f²
        out = {}
        for t in terms:
            if not len(stats) or t not in st.index:
                continue
            ttf = int(st.loc[t, "ttf"])
            # (ttf+1f)/(numberOfFieldTokens+1f) in float
            p = dtype(dtype(ttf + 1.0) / dtype(sum_ttf + 1.0))

            def _score(tf, nb, p=p):
                tff = tf.astype(dtype)
                dl = doclen[np.asarray(nb, np.uint8)]
                s = (np.log1p(tff / (mu * p)) +
                     np.log(np.float64(mu) / (dl.astype(np.float64) + np.float64(mu)))
                     ).astype(dtype)
                return np.maximum(s, dtype(0.0))

            max_tf = int(st.loc[t, "max_tf"])
            # bound: shortest doc (largest norm byte -> smallest doclen)
            ub = (np.log1p(np.float64(max_tf) / np.float64(mu * p)) +
                  np.log(np.float64(mu) / (np.float64(doclen[255]) + np.float64(mu))))
            out[t] = _SimWeight(t, int(st.loc[t, "df"]), _score,
                                float(max(ub, 0.0)))
        return out


class LMJelinekMercer(Similarity):
    """LMJelinekMercerSimilarity (ref: lucene/core/.../search/similarities/
    LMJelinekMercerSimilarity.java:56-60): per matched term
        score = (float) ln(1 + ((1-λ)·tf/docLen) / (λ·p)),
    p = (ttf+1)/(sumTotalTermFreq+1) (LMSimilarity.DefaultCollectionModel),
    docLen decoded from the norm byte (SimilarityBase NORM_TABLE = 1/f²).
    λ defaults to 0.7 (the long-query setting of Zhai & Lafferty)."""

    name = "lm_jm"

    def __init__(self, lam: float = 0.7):
        self.lam = float(lam)

    def make_weights(self, terms, stats, max_doc, sum_ttf, dtype=np.float32):
        st = stats.set_index("term") if len(stats) else stats
        lam = dtype(self.lam)
        one_m = dtype(1.0 - self.lam)
        doclen = NORM_INV_TABLE.astype(dtype)
        out = {}
        for t in terms:
            if not len(stats) or t not in st.index:
                continue
            ttf = int(st.loc[t, "ttf"])
            p = dtype(dtype(ttf + 1.0) / dtype(sum_ttf + 1.0))

            def _score(tf, nb, p=p):
                tff = tf.astype(dtype)
                dl = doclen[np.asarray(nb, np.uint8)]
                return np.log1p((one_m * tff / dl) / (lam * p)).astype(dtype)

            max_tf = int(st.loc[t, "max_tf"])
            ub = np.log1p((np.float64(one_m) * max_tf / np.float64(doclen[255]))
                          / (np.float64(lam) * np.float64(p)))
            out[t] = _SimWeight(t, int(st.loc[t, "df"]), _score, float(ub))
        return out


class DFR_InL2(Similarity):
    """DFRSimilarity with BasicModel I(n), AfterEffect L, Normalization
    H2 — the classic InL2 configuration (ref: lucene/core/.../search/
    similarities/DFRSimilarity.java:62-88, BasicModelIn.java:31-36,
    AfterEffectL.java:27-31, NormalizationH2.java:32-36):

        tfn   = tf · log2(1 + c·avgdl/docLen)          (H2, c = 1)
        score = tfn · log2((N+1)/(df+0.5)) · 1/(1+tfn) (In × L)
    """

    name = "dfr"

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def make_weights(self, terms, stats, max_doc, sum_ttf, dtype=np.float32):
        from .bm25 import avg_field_length
        st = stats.set_index("term") if len(stats) else stats
        avgdl = avg_field_length(sum_ttf, max_doc, dtype=dtype)
        c = dtype(self.c)
        doclen = NORM_INV_TABLE.astype(dtype)
        ln2 = dtype(np.log(2.0))
        out = {}
        for t in terms:
            if not len(stats) or t not in st.index:
                continue
            df = int(st.loc[t, "df"])
            # log2((N+1)/(df+0.5)) in double then cast, as in BasicModelIn
            ic = dtype(np.log2((max_doc + 1.0) / (df + 0.5)))

            def _score(tf, nb, ic=ic):
                tff = tf.astype(dtype)
                dl = doclen[np.asarray(nb, np.uint8)]
                tfn = (tff * (np.log1p(c * avgdl / dl) / ln2)).astype(dtype)
                return (tfn * ic / (dtype(1.0) + tfn)).astype(dtype)

            # monotone in tf and in 1/dl: bound at (max_tf, shortest doc)
            max_tf = int(st.loc[t, "max_tf"])
            tfn_ub = max_tf * np.log2(1.0 + float(c) * float(avgdl)
                                      / float(doclen[255]))
            ub = tfn_ub * float(ic) / (1.0 + tfn_ub)
            out[t] = _SimWeight(t, df, _score, float(ub))
        return out


class DFR_GL2(Similarity):
    """DFRSimilarity with BasicModel G (geometric Bose-Einstein limit),
    AfterEffect L, Normalization H2 (ref: lucene/core/.../search/
    similarities/BasicModelG.java:34-41, DFRSimilarity.java:108-111):

        λ     = (F+1)/(N+F+1),  F = totalTermFreq
        tfn   = tf · log2(1 + c·avgdl/docLen)              (H2, c = 1)
        score = [log2(λ+1) + tfn·log2((1+λ)/λ)] / (1+tfn)  (G × L)

    d/dtfn of (a + b·tfn)/(1+tfn) = (b−a)/(1+tfn)² with
    b = log2((1+λ)/λ) > a = log2(1+λ) for λ < 1, so the score is
    monotone increasing in tfn → WAND bound at (max_tf, shortest doc)."""

    name = "dfr_gl2"

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def make_weights(self, terms, stats, max_doc, sum_ttf, dtype=np.float32):
        from .bm25 import avg_field_length
        st = stats.set_index("term") if len(stats) else stats
        avgdl = avg_field_length(sum_ttf, max_doc, dtype=dtype)
        c = dtype(self.c)
        doclen = NORM_INV_TABLE.astype(dtype)
        ln2 = dtype(np.log(2.0))
        out = {}
        for t in terms:
            if not len(stats) or t not in st.index:
                continue
            df = int(st.loc[t, "df"])
            ttf = int(st.loc[t, "ttf"])
            # double precision inside the model, float cast at the end,
            # as in BasicModelG.score
            lam = (ttf + 1.0) / (max_doc + ttf + 1.0)
            a = np.float64(np.log2(lam + 1.0))
            b = np.float64(np.log2((1.0 + lam) / lam))

            def _score(tf, nb, a=a, b=b):
                tff = tf.astype(dtype)
                dl = doclen[np.asarray(nb, np.uint8)]
                tfn = (tff * (np.log1p(c * avgdl / dl) / ln2)) \
                    .astype(np.float64)
                return ((a + tfn * b) / (1.0 + tfn)).astype(dtype)

            max_tf = int(st.loc[t, "max_tf"])
            tfn_ub = max_tf * np.log2(1.0 + float(c) * float(avgdl)
                                      / float(doclen[255]))
            ub = (float(a) + tfn_ub * float(b)) / (1.0 + tfn_ub)
            out[t] = _SimWeight(t, df, _score, float(ub))
        return out


class IB(Similarity):
    """IBSimilarity — the information-based family (ref: lucene/core/.../
    search/similarities/IBSimilarity.java:47-77): per matched term

        score = distribution(tfn, λ)
        tfn   = tf · log2(1 + c·avgdl/docLen)            (NormalizationH2,
                 NormalizationH2.java:32-36, c = 1)
        λ_DF  = (df+1)/(N+1)                             (LambdaDF.java:27-30)
        λ_TTF = (ttf+1)/(N+1)                            (LambdaTTF.java:27-30)

    distributions (SimilarityBase.log2 = ln/ln 2):
        LL:  -log2(λ / (tfn + λ))                        (DistributionLL.java:29-32)
        SPL: -log2((λ^(tfn/(tfn+1)) - λ) / (1 - λ))      (DistributionSPL.java:30-35)

    Both distributions are monotone increasing in tfn, and tfn is
    monotone in tf and in 1/docLen, so the WAND bound is evaluated at
    (max_tf, shortest doc) like the other SimilarityBase models."""

    name = "ib"

    def __init__(self, distribution: str = "spl", lam: str = "df",
                 c: float = 1.0):
        if distribution not in ("spl", "ll"):
            raise ValueError(f"unknown IB distribution {distribution!r}")
        if lam not in ("df", "ttf"):
            raise ValueError(f"unknown IB lambda {lam!r}")
        self.distribution = distribution
        self.lam_kind = lam
        self.c = float(c)

    def _dist(self, tfn, lam, dtype):
        ln2 = np.float64(np.log(2.0))
        tfn64 = tfn.astype(np.float64)
        lam = np.float64(lam)
        if self.distribution == "ll":
            return (-np.log(lam / (tfn64 + lam)) / ln2).astype(dtype)
        expo = tfn64 / (tfn64 + 1.0)
        return (-np.log((np.power(lam, expo) - lam) / (1.0 - lam))
                / ln2).astype(dtype)

    def make_weights(self, terms, stats, max_doc, sum_ttf, dtype=np.float32):
        from .bm25 import avg_field_length
        st = stats.set_index("term") if len(stats) else stats
        avgdl = avg_field_length(sum_ttf, max_doc, dtype=dtype)
        c = dtype(self.c)
        doclen = NORM_INV_TABLE.astype(dtype)
        ln2 = dtype(np.log(2.0))
        out = {}
        for t in terms:
            if not len(stats) or t not in st.index:
                continue
            df = int(st.loc[t, "df"])
            ttf = int(st.loc[t, "ttf"])
            # (x+1F)/(N+1F) in float, per Lambda{DF,TTF}.java
            num = df if self.lam_kind == "df" else ttf
            lam = dtype(dtype(num + 1.0) / dtype(max_doc + 1.0))

            def _score(tf, nb, lam=lam):
                tff = tf.astype(dtype)
                dl = doclen[np.asarray(nb, np.uint8)]
                tfn = (tff * (np.log1p(c * avgdl / dl) / ln2)).astype(dtype)
                return self._dist(tfn, lam, dtype)

            max_tf = int(st.loc[t, "max_tf"])
            tfn_ub = np.asarray([max_tf * np.log2(1.0 + float(c) * float(avgdl)
                                                  / float(doclen[255]))], dtype)
            ub = float(self._dist(tfn_ub, lam, np.float64)[0])
            out[t] = _SimWeight(t, df, _score, ub)
        return out


class IB_SPL(IB):
    """IBSimilarity(DistributionSPL, LambdaDF, NormalizationH2)."""

    name = "ib_spl"

    def __init__(self, c: float = 1.0):
        super().__init__("spl", "df", c)


class IB_LL(IB):
    """IBSimilarity(DistributionLL, LambdaDF, NormalizationH2)."""

    name = "ib_ll"

    def __init__(self, c: float = 1.0):
        super().__init__("ll", "df", c)




class SweetSpot(Classic):
    """SweetSpotSimilarity (ref: lucene/misc/src/java/org/apache/lucene/
    misc/SweetSpotSimilarity.java:41): DefaultSimilarity with a
    tunable tf "baseline" (flat tf_base up to tf_min, then
    sqrt(freq + tf_base^2 - tf_min)) and a plateaued lengthNorm
    (1/sqrt(steepness*(|L-min|+|L-max|-(max-min)) + 1)) that scores all
    lengths inside [ln_min, ln_max] equally.

    Norm discipline: the index stores DefaultSimilarity norm bytes
    (encode(1/sqrt(dl))); SweetSpot recovers the quantized dl via
    BM25's inverse table and runs computeLengthNorm through the same
    SmallFloat-315 encode/decode roundtrip the reference's
    lengthNorm->byte->decode path applies, so scores carry the byte
    quantization exactly once, like an index written by this
    similarity (up to dl's own quantization, documented)."""

    name = "sweetspot"

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5,
                 tf_base: float = 0.0, tf_min: float = 0.0):
        self.ln_min, self.ln_max = int(ln_min), int(ln_max)
        self.steep = np.float32(steepness)
        self.tf_base, self.tf_min = np.float32(tf_base), np.float32(tf_min)

    def baseline_tf(self, freq, dtype=np.float32):
        freq = np.asarray(freq, dtype)
        out = np.where(
            freq <= self.tf_min, self.tf_base,
            np.sqrt(freq + dtype(self.tf_base * self.tf_base)
                    - self.tf_min).astype(dtype))
        return np.where(freq == 0.0, dtype(0.0), out).astype(dtype)

    def compute_length_norm(self, num_terms, dtype=np.float32):
        n = np.asarray(num_terms, np.float64)
        l, h, st = self.ln_min, self.ln_max, np.float64(self.steep)
        return (1.0 / np.sqrt(st * (np.abs(n - l) + np.abs(n - h)
                                    - (h - l)) + 1.0)).astype(dtype)

    def make_weights(self, terms, stats, max_doc, sum_ttf,
                     dtype=np.float32):
        from ..index.smallfloat import (NORM_INV_TABLE, byte315_to_float,
                                        float_to_byte315)
        # lengthNorm table: stored byte -> quantized dl ->
        # computeLengthNorm -> encode/decode roundtrip (one byte
        # quantization, like a SweetSpot-written norm)
        dl = np.rint(NORM_INV_TABLE.astype(np.float64))
        ln = self.compute_length_norm(dl, dtype=dtype)
        table = byte315_to_float(float_to_byte315(ln)).astype(dtype)
        st = stats.set_index("term") if len(stats) else stats
        # Classic couples terms through queryNorm; same idf/qnorm pass
        present = [t for t in terms if len(stats) and t in st.index]
        idfs = {t: dtype(np.log(max_doc / np.float64(int(st.loc[t, "df"]) + 1)) + 1.0)
                for t in present}
        ssw = dtype(0.0)
        for t in terms:
            if t in idfs:
                ssw = dtype(ssw + dtype(idfs[t] * idfs[t]))
        qnorm = dtype(1.0 / np.sqrt(np.float64(ssw))) if ssw > 0 else dtype(1.0)
        res = {}
        for t in present:
            value = dtype(dtype(idfs[t] * qnorm) * idfs[t])

            def _score(tf, nb, value=value):
                tff = self.baseline_tf(tf, dtype=dtype)
                raw = (tff * value).astype(dtype)
                return (raw * table[np.asarray(nb, np.uint8)]).astype(dtype)

            max_tf = int(st.loc[t, "max_tf"])
            res[t] = _SimWeight(
                t, int(st.loc[t, "df"]), _score,
                float(self.baseline_tf(np.array([max_tf]))[0]
                      * value * table.max()))
        return res


_REGISTRY = {"bm25": BM25, "classic": Classic, "default": Classic,
             "tfidf": Classic, "lm_dirichlet": LMDirichlet,
             "lm_jm": LMJelinekMercer, "lm_jelinek_mercer": LMJelinekMercer,
             "dfr": DFR_InL2, "dfr_inl2": DFR_InL2, "dfr_gl2": DFR_GL2,
             "ib": IB_SPL, "ib_spl": IB_SPL, "ib_ll": IB_LL,
             "sweetspot": SweetSpot}


def get_similarity(sim) -> Similarity:
    if sim is None:
        return BM25()
    if isinstance(sim, Similarity):
        return sim
    return _REGISTRY[str(sim).lower()]()
