"""MemoryIndex analog — lucene/memory's single-document in-RAM index
(ref: lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java: "high-performance single-document main memory
index ... typically used for prospective search" — i.e. percolation:
match MANY stored queries against ONE new document).

Spark-scale use: percolate a stream of documents against a broadcast
query set — `percolate_expr` builds a single JVM-side predicate over
the analyzed token array, so the matching runs inside whole-stage
codegen with zero Python in the hot path.

Sibling: `search/memoryindex.py` is the SCORE-faithful twin — the
reference's `search()` float semantics (one-doc DefaultSimilarity,
byte315 norms, per-query queryNorm/coord) and a scored `percolate()`
with a hash-checked contract entry.  `score()` below keeps the simpler
BM25-based convenience scoring this module always had.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..analysis.standard import analyze_text
from ..search.bm25 import avg_field_length, make_weight, score_postings
from ..index.smallfloat import encode_norm


@dataclass
class MemoryIndex:
    """One document, inverted: term -> (tf, positions)."""

    tf: dict
    positions: dict
    length: int

    @classmethod
    def from_text(cls, text: str) -> "MemoryIndex":
        toks = analyze_text(text)
        tf: dict[str, int] = {}
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            tf[t] = tf.get(t, 0) + 1
            pos.setdefault(t, []).append(i)
        return cls(tf, pos, len(toks))

    def matches(self, terms: list[str], op: str = "OR") -> bool:
        hits = sum(1 for t in terms if t in self.tf)
        if op == "AND":
            return hits == len(terms)
        if op.startswith("MSM"):
            return hits >= int(op[3:])
        return hits > 0

    def matches_phrase(self, terms: list[str]) -> bool:
        """Exact phrase over the single doc's positions."""
        if not terms or any(t not in self.positions for t in terms):
            return False
        first = np.asarray(self.positions[terms[0]])
        for off, t in enumerate(terms[1:], 1):
            nxt = np.asarray(self.positions[t])
            first = first[np.isin(first + off, nxt)]
            if not len(first):
                return False
        return True

    def score(self, terms: list[str]) -> float:
        """BM25 with the single doc as the whole collection (MemoryIndex
        search semantics: maxDoc=1, df=1 for present terms)."""
        norm = encode_norm(np.array([self.length]))[0]
        avgdl = avg_field_length(self.length, 1)
        s = np.float32(0.0)
        for t in terms:
            if t not in self.tf:
                continue
            tw = make_weight(t, 1, 1, avgdl)
            s += score_postings(tw, np.array([self.tf[t]]),
                                np.array([norm]))[0]
        return float(s)


def percolate_expr(tokens_col, queries: dict[str, tuple[list[str], str]]):
    """Batch percolation: given an array<string> analyzed-tokens column
    and {query_name: (terms, op)}, returns an array<string> column of the
    query names that match each row — pure JVM expressions (arrays_overlap
    / forall-style set tests), broadcastable to any fleet size."""
    from pyspark.sql import functions as F

    branches = []
    for name, (terms, op) in queries.items():
        tarr = F.array(*[F.lit(t) for t in terms])
        if op == "AND":
            cond = F.size(F.array_intersect(tokens_col, tarr)) == len(terms)
        elif op.startswith("MSM"):
            cond = F.size(F.array_intersect(tokens_col, tarr)) >= int(op[3:])
        else:
            cond = F.arrays_overlap(tokens_col, tarr)
        branches.append(F.when(cond, F.lit(name)))
    return F.filter(F.array(*branches), lambda x: x.isNotNull())
