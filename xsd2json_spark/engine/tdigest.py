"""Mergeable quantile sketches (t-digest) for cross-snapshot stats
(SURVEY §4.2): percentile_approx gives per-run quantiles but its sketch
is not exposed for merging ACROSS snapshots/runs; a t-digest is — so a
fleet of daily validation runs can keep one tiny artifact per run and
still answer "p99 over the last quarter" exactly as if computed in one
pass (merge-equality is tested, sketch(A∪B) ≈ merge(sketch(A),
sketch(B))).

Algorithm: Dunning's merging t-digest with the classic size bound
4·n·q·(1-q)/δ per centroid (δ = compression). Pure Python driver-side;
the distributed path computes one digest per Arrow batch stream
(mapInPandas, one partial row per partition) and merges partials on the
driver — the same partial/final discipline as the engine's aggregates.

Scale: a digest is O(compression) centroids (~100 pairs of floats);
partials are one row per partition. No row-level collect anywhere.
"""

from __future__ import annotations

import bisect
import json
from typing import Iterable, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TDigest:
    __slots__ = ("compression", "centroids", "n")

    def __init__(self, compression: int = 100):
        self.compression = compression
        self.centroids: List[Tuple[float, float]] = []  # (mean, weight), sorted
        self.n = 0.0

    # -- construction ------------------------------------------------------

    @classmethod
    def from_values(cls, values: Iterable[float], compression: int = 100) -> "TDigest":
        d = cls(compression)
        d.add_batch(values)
        return d

    def add_batch(self, values: Iterable[float]) -> None:
        vals = sorted(float(v) for v in values)
        if not vals:
            return
        incoming = [(v, 1.0) for v in vals]
        self._merge_sorted(incoming)

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(min(self.compression, other.compression))
        out.centroids = list(self.centroids)
        out.n = self.n
        out._merge_sorted(list(other.centroids))
        return out

    def _merge_sorted(self, incoming: List[Tuple[float, float]]) -> None:
        """Merge a mean-sorted centroid list into this digest, then
        recompress under the 4·n·q·(1-q)/δ bound."""
        merged: List[Tuple[float, float]] = []
        a, b = self.centroids, sorted(incoming)
        i = j = 0
        while i < len(a) and j < len(b):
            if a[i][0] <= b[j][0]:
                merged.append(a[i]); i += 1
            else:
                merged.append(b[j]); j += 1
        merged.extend(a[i:])
        merged.extend(b[j:])
        total = sum(w for _, w in merged)
        self.n = total
        if not merged:
            self.centroids = []
            return
        # k1 scale function k(q) = δ/(2π)·asin(2q−1): a centroid may span
        # at most one unit of k — ~δ centroids total, with fine resolution
        # at the tails where k' explodes (Dunning's merging t-digest)
        import math

        def _k(q: float) -> float:
            return self.compression / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))

        out: List[Tuple[float, float]] = []
        cur_m, cur_w = merged[0]
        w_before = 0.0
        k_lo = _k(0.0)
        for m, w in merged[1:]:
            if _k((w_before + cur_w + w) / total) - k_lo <= 1.0:
                # weighted mean merge
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out.append((cur_m, cur_w))
                w_before += cur_w
                k_lo = _k(w_before / total)
                cur_m, cur_w = m, w
        out.append((cur_m, cur_w))
        self.centroids = out

    # -- queries -----------------------------------------------------------

    def quantile(self, q: float) -> float:
        if not self.centroids:
            raise ValueError("empty digest")
        if len(self.centroids) == 1:
            return self.centroids[0][0]
        q = min(max(q, 0.0), 1.0)
        target = q * self.n
        # cumulative weight at each centroid's midpoint
        cums = []
        acc = 0.0
        for m, w in self.centroids:
            cums.append(acc + w / 2.0)
            acc += w
        if target <= cums[0]:
            return self.centroids[0][0]
        if target >= cums[-1]:
            return self.centroids[-1][0]
        idx = bisect.bisect_left(cums, target)
        c0, c1 = cums[idx - 1], cums[idx]
        m0, m1 = self.centroids[idx - 1][0], self.centroids[idx][0]
        frac = (target - c0) / (c1 - c0) if c1 > c0 else 0.0
        return m0 + frac * (m1 - m0)

    def quantiles(self, probs: Sequence[float]) -> List[float]:
        return [self.quantile(p) for p in probs]

    # -- serialization -----------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "kind": "tdigest",
            "compression": self.compression,
            "n": self.n,
            "centroids": [[m, w] for m, w in self.centroids],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TDigest":
        out = cls(d["compression"])
        out.n = float(d["n"])
        out.centroids = [(float(m), float(w)) for m, w in d["centroids"]]
        return out


# ---------------------------------------------------------------------------
# Spark path: per-partition partials -> driver merge
# ---------------------------------------------------------------------------


def tdigest_partials(df: DataFrame, expr: str, compression: int = 100) -> DataFrame:
    """One digest PARTIAL per input partition via mapInPandas: each task
    folds its Arrow batches into a single digest and emits one JSON row.
    Output schema: (n long, centroids string)."""
    import pandas as pd

    def _fold(batches):
        d = TDigest(compression)
        for pdf in batches:
            vals = pd.to_numeric(pdf["__v"], errors="coerce").dropna()
            if len(vals):
                d.add_batch(vals.to_numpy())
        if d.n > 0:
            yield pd.DataFrame({"n": [int(d.n)], "centroids": [json.dumps(d.to_dict())]})

    src = df.select(F.expr(expr).cast("double").alias("__v"))
    return src.mapInPandas(_fold, schema="n long, centroids string")


def tdigest_sketch(df: DataFrame, expr: str, compression: int = 100) -> TDigest:
    """Distributed t-digest: partial per partition, merged driver-side.
    The collect is O(#partitions), never O(rows)."""
    rows = tdigest_partials(df, expr, compression).collect()
    out = TDigest(compression)
    for r in rows:
        out = out.merge(TDigest.from_dict(json.loads(r["centroids"])))
    return out
