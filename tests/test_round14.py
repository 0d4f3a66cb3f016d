"""Round-4 span_within / span_containing queries (Lucene
SpanWithinQuery / SpanContainingQuery shapes): randomized brute-force
oracles plus DSL identity; the hard DuckDB gates are the driver
entries bm25_span_within and bm25_span_containing."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.query_dsl import execute_query, parse_query
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

CFG = EngineConfig(num_segments=3)
K1, B = CFG.k1, CFG.b

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
_rng = np.random.default_rng(7)
TEXTS = [" ".join(_rng.choice(VOCAB, size=_rng.integers(2, 12)))
         for _ in range(60)]
N = len(TEXTS)
TOKS = [t.split() for t in TEXTS]
DL = np.array([len(t) for t in TOKS], dtype=np.float64)
AVGDL = DL.mean()


def _idf(t: str) -> float:
    df = sum(1 for tk in TOKS if t in tk)
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def _tf_part(tf: float, dl: float) -> float:
    return tf / (tf + K1 * (1.0 - B + B * dl / AVGDL))


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r14") / "idx")
    tbl = pa.table({"doc_id": pa.array(range(N), type=pa.int64()),
                    "text": pa.array(TEXTS)})
    build_index(rd.from_arrow(tbl), out, CFG,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    return out


def _brute(mode: str, little: str, big: list[str], slop: int
           ) -> dict[int, float]:
    """Positions 0-based; a cell s is valid iff window [s-W+1, s]
    contains every big term (W = n_big + slop) — the engine's
    _span_window_score rule."""
    W = len(big) + slop
    res = {}
    for i, tk in enumerate(TOKS):
        bigpos = {b_: [j for j, x in enumerate(tk) if x == b_]
                  for b_ in big}
        litpos = [j for j, x in enumerate(tk) if x == little]
        if any(not v for v in bigpos.values()) or not litpos:
            continue
        smax = max(max(v) for v in [*bigpos.values(), litpos]) + W + 2
        valid = [s for s in range(smax)
                 if all(any(s - W + 1 <= p <= s for p in ps)
                        for ps in bigpos.values())
                 and (mode != "span_containing"
                      or any(s - W + 1 <= p <= s for p in litpos))]
        if mode == "span_containing":
            tf, isum = len(valid), sum(_idf(b_) for b_ in big)
        else:
            tf = sum(1 for p in litpos
                     if any(p <= s <= p + W - 1 for s in valid))
            isum = _idf(little)
        if tf:
            res[i] = round(isum * _tf_part(float(tf), DL[i]), 6)
    return res


CASES = [("eps alpha beta", 2), ("delta gamma", 1),
         ("alpha beta gamma", 3), ("zeta eta alpha", 4)]


@pytest.mark.parametrize("mode", ["span_within", "span_containing"])
@pytest.mark.parametrize("q,slop", CASES)
def test_span_wc_brute_force(idx, mode, q, slop):
    s = IndexSearcher(idx)
    toks = q.split()
    little, big = toks[0], list(dict.fromkeys(toks[1:]))
    want = _brute(mode, little, big, slop)
    assert want, f"degenerate case {q!r}"       # fixture is non-trivial
    out = s.search({"q": q}, k=N, mode=mode, slop=slop)
    got = {int(d): round(float(v), 6)
           for d, v in zip(out["doc_id"], out["score"])}
    assert got == want
    # global order: (score desc, doc_id asc)
    order = sorted(got, key=lambda d: (-got[d], d))
    assert list(out["doc_id"]) == order


def test_span_wc_differ_and_relate(idx):
    # containing scores on big idf, within on little idf — same query
    # must produce different score scales but both non-empty; and a doc
    # in span_containing's match set always appears in span_within's
    # (a valid big window holding little => that little pos is covered)
    s = IndexSearcher(idx)
    q = {"q": "eps alpha beta"}
    cont = s.search(q, k=N, mode="span_containing", slop=2)
    within = s.search(q, k=N, mode="span_within", slop=2)
    assert len(cont) and len(within)
    assert set(cont["doc_id"]) <= set(within["doc_id"])


def test_span_wc_dsl_identity(idx):
    s = IndexSearcher(idx)
    direct = s.search({"q": "eps alpha beta"}, k=10,
                      mode="span_within", slop=2)
    via = execute_query({"span_within": {"query": "eps alpha beta",
                                         "slop": 2, "k": 10}},
                        searcher=s)
    assert list(via["doc_id"]) == list(direct["doc_id"])
    assert list(via["score"]) == list(direct["score"])
    direct_c = s.search({"q": "eps alpha beta"}, k=10,
                        mode="span_containing", slop=2)
    via_c = execute_query({"span_containing": {"query": "eps alpha beta",
                                               "slop": 2, "k": 10}},
                          searcher=s)
    assert list(via_c["doc_id"]) == list(direct_c["doc_id"])


def test_span_wc_validation(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="little"):
        s.search({"q": "alpha"}, k=5, mode="span_within")
    with pytest.raises(ValueError, match="slop"):
        s.search({"q": "a b"}, k=5, mode="match", slop=2)
    with pytest.raises(ValueError, match="does not support"):
        parse_query({"span_within": {"query": "a b", "end": 3}})
    # zero-df member (little or big) matches nothing, doesn't raise
    out = s.search({"q": "qqq alpha"}, k=5, mode="span_within")
    assert len(out) == 0
