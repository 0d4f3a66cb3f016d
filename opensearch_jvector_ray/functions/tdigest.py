"""Merging t-digest: the approximate-percentile sketch OpenSearch's
percentiles agg uses at scale [Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", public algorithm — the k1 scale
function variant].

The repo's exact percentiles agg ships per-segment (value, count)
partials — right for integer-ish columns, but partial size is
distinct-value-bounded, which blows up on high-cardinality doubles at
100 TB.  The t-digest partial is O(compression) per segment regardless
of cardinality: each segment compresses its match-set values into
<= ~2*compression centroids, the driver concatenates centroid lists and
re-compresses once.  Everything is deterministic for a FIXED
segmentation (sorted inputs, greedy merge, no randomness); like any
t-digest, the merged sketch depends on how data was partitioned, so the
driver entry is rows-only and accuracy is pytest-gated instead of
SQL-gated (rank error <= ~1/compression near the median, tighter at the
tails — the k1 scale function's guarantee).
"""

from __future__ import annotations

import numpy as np


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """k1 scale function: delta/(2*pi) * asin(2q - 1) — tail-accurate."""
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0)
                                             - 1.0)


def compress(means: np.ndarray, weights: np.ndarray,
             compression: float) -> tuple[np.ndarray, np.ndarray]:
    """Fully vectorized compression pass [the scale-function-bucketing
    construction of the merging t-digest]: sort (mean asc, weight asc —
    a total order, so re-compression is deterministic), map each item's
    LEFT cumulative quantile through k1, and fuse every run of items
    falling in the same integer k1 cell.  Cells are exactly width 1 in
    k-space, so every fused centroid satisfies the t-digest size bound
    (k1(q_right) - k1(q_left) <= 1), and the centroid count is bounded
    by the k1 range (<= compression/2 + 1) — same guarantees as the
    sequential greedy merge, with numpy reduceat instead of a per-value
    Python loop (the whole point of the scale path: a 1M-value segment
    partial is one sort + three vector ops, not 1M interpreter
    iterations)."""
    if not len(means):
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.lexsort((weights, means))
    means = means[order].astype(np.float64)
    weights = weights[order].astype(np.float64)
    total = float(weights.sum())
    q_left = (np.cumsum(weights) - weights) / total
    cell = np.floor(_k1(q_left, compression)).astype(np.int64)
    # run starts: first item of each k1 cell (cells are sorted)
    starts = np.flatnonzero(np.diff(cell, prepend=cell[0] - 1) != 0)
    w_out = np.add.reduceat(weights, starts)
    m_out = np.add.reduceat(means * weights, starts) / w_out
    return m_out, w_out


def from_values(values: np.ndarray,
                compression: float) -> tuple[np.ndarray, np.ndarray]:
    """Build a digest from raw values (each value weight 1)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    return compress(v, np.ones(len(v), dtype=np.float64), compression)


def merge(parts: "list[tuple[np.ndarray, np.ndarray]]",
          compression: float) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-segment digests: concatenate centroids, one
    re-compression pass (the documented single-merge rule)."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return (np.array([], dtype=np.float64),
                np.array([], dtype=np.float64))
    means = np.concatenate([p[0] for p in parts])
    weights = np.concatenate([p[1] for p in parts])
    return compress(means, weights, compression)


def quantile(means: np.ndarray, weights: np.ndarray,
             p: float) -> float:
    """Estimate the p-quantile (0 <= p <= 1) by linear interpolation
    between centroid midpoints (the standard t-digest estimator;
    endpoints clamp to the extreme centroid means)."""
    if not len(means):
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = float(weights.sum())
    target = p * total
    # midpoint cumulative weights: cum_i = sum(w[:i]) + w[i]/2
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))
