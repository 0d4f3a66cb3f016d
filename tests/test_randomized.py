"""Randomized adversarial equality: for several seeded random corpora and
query mixes, TAAT, WAND and rescore must agree with each other and with
the brute-force oracle — including under filters and edge-case k values
(the randomized-vectors test style of the reference,
`KNNJVectorTests.java:510`)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

from tests.oracle import BruteForceBM25

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "the", "of", "x1", "x2", "x3"]     # includes stopwords + ties fuel


def _random_corpus(seed: int, n_docs: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, len(VOCAB) + 1) ** 1.2
    p /= p.sum()
    texts = []
    for _ in range(n_docs):
        ln = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(VOCAB, size=ln, p=p)) if ln else "")
    return pa.table({
        "conv_id": [f"c{i//4:04d}" for i in range(n_docs)],
        "turn_idx": pa.array([i % 4 for i in range(n_docs)], type=pa.int32()),
        "role": [("user", "assistant")[i % 2] for i in range(n_docs)],
        "text": pa.array(texts, type=pa.string()),
        "tool": [""] * n_docs,
        "ts": pa.array(list(range(n_docs)), type=pa.timestamp("us")),
    })


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_modes_agree_with_oracle_randomized(seed, tmp_path):
    rng = np.random.default_rng(seed + 100)
    corpus = _random_corpus(seed, n_docs=300)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(corpus), idx,
                EngineConfig(num_segments=int(rng.integers(1, 6)),
                             block_size=int(rng.integers(2, 16))),
                IndexSpec())
    s = IndexSearcher(idx)
    docs = {(corpus["conv_id"][i].as_py(), corpus["turn_idx"][i].as_py()):
            corpus["text"][i].as_py() for i in range(corpus.num_rows)}
    oracle = BruteForceBM25(docs, EngineConfig().stopwords)

    queries = {}
    for qi in range(6):
        # up to 6 terms: >=3-term queries exercise WAND's analyzed-term-
        # order summation (tie rank-identity breaks if contributions are
        # summed in mutable cursor order — the ADVICE.md finding)
        n_terms = int(rng.integers(1, 7))
        queries[f"q{qi}"] = " ".join(rng.choice(VOCAB, size=n_terms))
    k = int(rng.integers(1, 40))

    taat = s.search(queries, k=k)
    wand = s.search(queries, k=k, mode="wand")
    resc = s.search(queries, k=k, rescore_oversample=2.0)
    pd.testing.assert_frame_equal(taat, wand, atol=1e-9)
    pd.testing.assert_frame_equal(taat, resc, atol=1e-9)
    for qid, qtext in queries.items():
        gold = oracle.topk(qtext, k)
        got = taat[taat.query_id == qid].sort_values("rank")
        assert [(r.conv_id, r.turn_idx) for r in got.itertuples()] == \
            [key for key, _ in gold], (seed, qid)
        np.testing.assert_allclose(got.score.to_numpy(),
                                   [sc for _, sc in gold], atol=1e-9)

    # filtered: role == user, TAAT vs WAND vs oracle
    f = pc.field("role") == "user"
    allowed = {key for key in docs
               if key[1] % 2 == 0}   # role user == even turn in _random_corpus
    ft = s.search(queries, k=k, filter=f)
    fw = s.search(queries, k=k, filter=f, mode="wand")
    pd.testing.assert_frame_equal(ft, fw, atol=1e-9)
    for qid, qtext in queries.items():
        gold = oracle.topk(qtext, k, allowed=allowed)
        got = ft[ft.query_id == qid].sort_values("rank")
        assert [(r.conv_id, r.turn_idx) for r in got.itertuples()] == \
            [key for key, _ in gold], (seed, qid, "filtered")


def test_k_edge_cases(tmp_path):
    corpus = _random_corpus(99, n_docs=60)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(corpus), idx, EngineConfig(num_segments=3),
                IndexSpec())
    s = IndexSearcher(idx)
    one = s.search({"q": "alpha beta"}, k=1)
    assert len(one) <= 1
    big = s.search({"q": "alpha beta"}, k=10000)   # k >> matches
    wand_big = s.search({"q": "alpha beta"}, k=10000, mode="wand")
    pd.testing.assert_frame_equal(big, wand_big, atol=1e-9)
