"""Round-5 sixth review pass (query.py): exact integer sort keys
(beyond-2^53 / int64 extremes / uint64 no-wrap on the desc flip),
the lazy posting-decode gate (wand parity on multi-block postings),
and the new conflicting-option rejections (min_score x rescore,
matched_positions x term_weights, fractional histogram interval,
all-NULL percentiles match set).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher, _sort_key_numeric
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

CFG = EngineConfig(num_segments=3)

I64 = np.iinfo(np.int64)
# values that differ ONLY beyond float64's 2^53 integer range, plus
# both int64 extremes — a float64 sort key collapses / reorders these
BIG = [(1 << 53) + 1, 1 << 53, (1 << 53) + 2, -(1 << 60),
       I64.min, I64.max, 0, -1, (1 << 62) + 3, (1 << 62) + 4,
       7, -(1 << 53) - 1, -(1 << 53), 42, I64.max - 1]
# uint64 values above 2^63: an int64 cast wraps them negative
UBIG = [(1 << 64) - 1, (1 << 63) + 5, 1 << 63, (1 << 63) - 1,
        3, 0, (1 << 64) - 2, 9, (1 << 62), 11,
        (1 << 63) + 1, 5, 1, 2, (1 << 53) + 1]
N = len(BIG)
TEXTS = [f"alpha beta tok{i}" for i in range(N)]


def _corpus() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(N)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
        "big": pa.array(BIG, type=pa.int64()),
        "ubig": pa.array(UBIG, type=pa.uint64()),
        "nch": pa.array([len(t) for t in TEXTS], type=pa.int64()),
        "allnull": pa.array([None] * N, type=pa.float64()),
    })


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r17") / "idx")
    build_index(rd.from_arrow(_corpus()), out, CFG,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("big", "ubig", "nch", "allnull"),
                          ts_col=""))
    return out


def test_sort_key_numeric_integer_exact():
    t = pa.table({"big": pa.array(BIG, type=pa.int64()),
                  "ubig": pa.array(UBIG, type=pa.uint64()),
                  "f": pa.array([0.5] * N, type=pa.float64())})
    kb = _sort_key_numeric(t, "big")
    assert kb.dtype == np.int64
    assert kb.tolist() == BIG                      # exact, no collapse
    ku = _sort_key_numeric(t, "ubig")
    assert ku.dtype == np.uint64                   # no int64 wrap
    assert ku.tolist() == UBIG
    assert _sort_key_numeric(t, "f").dtype == np.float64


@pytest.mark.parametrize("field,vals", [("big", BIG), ("ubig", UBIG)])
@pytest.mark.parametrize("order", ["asc", "desc"])
def test_sort_by_huge_integers_exact(idx, field, vals, order):
    # every doc matches "alpha"; the engine's (field dir, key asc)
    # order must equal exact python integer sorting — a float64 key
    # collapses the 2^53+1 / 2^53+2 pairs and (desc) -sk wraps at
    # int64.min / any uint64 > 2^63
    s = IndexSearcher(idx)
    got = s.search({"q": "alpha"}, k=N, sort=(field, order))
    # all values distinct -> python's arbitrary-precision sort is the
    # exact expected order (ties would break key asc, never exercised)
    exp = sorted(range(N), key=lambda i: vals[i],
                 reverse=(order == "desc"))
    assert got["doc_id"].tolist() == [int(i) for i in exp]
    assert got[field].tolist() == [vals[i] for i in exp]


def test_wand_parity_on_multiblock_postings(tmp_path):
    # block_size=4 forces many posting blocks; after the lazy-decode
    # gate WAND must still return exactly the taat ranking (it now
    # decodes block-lazily via _TermCursor instead of the eager dict)
    cfg = EngineConfig(num_segments=2, block_size=4)
    n = 60
    rng = np.random.default_rng(17)
    texts = [" ".join(rng.choice(["alpha", "beta", "gamma", "delta"],
                                 size=rng.integers(2, 9)))
             for _ in range(n)]
    t = pa.table({"doc_id": pa.array(list(range(n)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = str(tmp_path / "widx")
    build_index(rd.from_arrow(t), out, cfg,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    s = IndexSearcher(out)
    q = {"q1": "alpha gamma", "q2": "beta delta alpha"}
    a = s.search(q, k=15, mode="taat").reset_index(drop=True)
    b = s.search(q, k=15, mode="wand").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_histogram_rejects_fractional_interval(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="whole number"):
        s.histogram_agg({"q": "alpha"}, value_col="nch",
                        interval=0.5, min_score=1e-9)
    # whole-valued float is fine
    out = s.histogram_agg({"q": "alpha"}, value_col="nch",
                          interval=4.0, min_score=1e-9)
    assert int(out["doc_count"].sum()) == N


def test_percentiles_all_null_match_set(idx):
    s = IndexSearcher(idx)
    got = s.percentiles_agg({"q": "alpha"}, value_col="allnull",
                            percents=[0.5, 0.9], min_score=1e-9)
    assert got.empty                   # undefined quantiles -> no rows
    # a populated column still works alongside
    ok = s.percentiles_agg({"q": "alpha"}, value_col="nch",
                           percents=[0.5], min_score=1e-9)
    assert len(ok) == 1


def test_min_score_rejects_rescore(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="rescore"):
        s.search({"q": "alpha"}, min_score=0.1, rescore_oversample=2.0)


def test_matched_positions_rejects_term_weights(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="term_weights"):
        s.matched_positions({"q": "alpha"}, k=5,
                            term_weights={"q": [("alpha", 2.0)]})
