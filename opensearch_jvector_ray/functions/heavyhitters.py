"""Misra–Gries / Space-Saving heavy hitters: the approximate terms-agg
scale path [Misra & Gries 1982; Metwally et al. Space-Saving; Agarwal
et al. "Mergeable Summaries" SIGMOD'12 — all public algorithms].

The exact terms agg ships per-segment (value, count) partials — right
while distinct values are bounded, but a 1B-cardinality field makes the
partial itself the bottleneck.  A Misra–Gries summary of capacity m is
O(m) regardless of cardinality, is MERGEABLE (the Agarwal et al. rule:
add counters pointwise, then subtract the (m+1)-th largest and drop
non-positive), and guarantees after any merge tree:

    true_count - N/(m+1)  <=  estimate  <=  true_count

so every value with true count > N/(m+1) is PRESENT in the summary and
its rank error is bounded.  Everything here is deterministic: counter
construction is a sorted groupby, ties trim (count desc, value asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def mg_from_values(values: np.ndarray, capacity: int) -> dict:
    """Build a capacity-m summary from raw values: exact per-batch
    counts (one np.unique) then ONE trim — equivalent to running the
    streaming algorithm over the batch, cheaper and deterministic.
    Values keep their NATIVE Python type (ints stay ints), so the
    (count desc, value asc) trim/tie order matches the exact facet
    agg's — stringified keys would rank '10' < '2'."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    vals, counts = np.unique(np.asarray(values), return_counts=True)
    return _trim({(v.item() if hasattr(v, "item") else v): int(c)
                  for v, c in zip(vals, counts)}, capacity)


def _trim(counters: dict, capacity: int) -> dict:
    if len(counters) <= capacity:
        return counters
    # (count desc, value asc) order; subtract the (m+1)-th count
    items = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    cut = items[capacity][1]
    return {v: c - cut for v, c in items[:capacity] if c - cut > 0}


def mg_merge(parts: "list[dict]", capacity: int) -> dict:
    """Mergeable-summaries rule: pointwise counter addition, one trim.
    Associative up to the shared deterministic trim order, so partial
    arrival order is irrelevant (pytest-pinned)."""
    acc: dict[str, int] = {}
    for p in parts:
        for v, c in p.items():
            acc[v] = acc.get(v, 0) + int(c)
    return _trim(acc, capacity)


def mg_topk(summary: dict, k: int,
            total: int, capacity: int) -> pd.DataFrame:
    """Top-k buckets with the per-value error bound: estimate is a
    LOWER bound on the true count; true count <= estimate + N/(m+1)
    (``max_error``).  ``guaranteed`` marks buckets whose lower bound
    beats the (k+1)-th value's upper bound — provably in the true
    top-k."""
    err = total // (capacity + 1)
    items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
    top = items[:k]
    next_ub = (items[k][1] + err) if len(items) > k else err
    return pd.DataFrame({
        "value": [v for v, _ in top],      # native dtype preserved
        "count_lower": np.array([c for _, c in top], dtype=np.int64),
        "max_error": np.int64(err),
        "guaranteed": np.array([c > next_ub for _, c in top],
                               dtype=bool),
    })
