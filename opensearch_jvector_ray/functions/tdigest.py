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
    """Greedy merge pass over (mean, weight) centroids [the t-digest
    merge algorithm]: inputs are sorted (mean asc, weight asc — a total
    order, so re-compression is deterministic), then adjacent centroids
    fuse while the fused centroid's k1-size stays <= 1."""
    if not len(means):
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.lexsort((weights, means))
    means = means[order].astype(np.float64)
    weights = weights[order].astype(np.float64)
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], weights[0]
    w_before = 0.0                      # weight fully to the left of cur
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_before / total
        q2 = (w_before + cur_w + w) / total
        if _k1(np.array(q2), compression) - _k1(np.array(q0),
                                                compression) <= 1.0:
            # fuse: weighted mean, exact accumulation
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w = cur_w + w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m, dtype=np.float64), \
        np.asarray(out_w, dtype=np.float64)


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
