"""Seeded randomized property tests for the round-15 surface: each
test draws several seeds and checks the engine against an independent
brute-force reference (the repo's randomized-suite pattern — fixed
seeds, no flakiness)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.synth import generate_conversations


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r15r") / "idx")
    build_index(rd.from_arrow(generate_conversations(np.arange(120))),
                d, EngineConfig(num_segments=4), IndexSpec())
    return d


def _corpus_tokens(cfg):
    from opensearch_jvector_ray.analyze import tokenize
    tbl = generate_conversations(np.arange(120))
    stream = tokenize(tbl["text"].combine_chunks(), cfg)
    terms = stream.terms.to_numpy(zero_copy_only=False)
    keys = [(tbl["conv_id"][i].as_py(), tbl["turn_idx"][i].as_py())
            for i in range(tbl.num_rows)]
    per_doc = [terms[stream.doc_idx == i].tolist()
               for i in range(tbl.num_rows)]
    return keys, per_doc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sparse_vector_random_weights(idx, seed):
    s = IndexSearcher(idx)
    keys, per_doc = _corpus_tokens(s.cfg)
    vocab = sorted({t for toks in per_doc for t in toks})
    rng = np.random.default_rng(seed)
    toks = rng.choice(vocab, size=4, replace=False)
    q = [(str(t), float(rng.integers(1, 9))) for t in toks]
    gold = {}
    for k, doc in zip(keys, per_doc):
        sc = sum(w * doc.count(t) for t, w in q)
        if sc > 0:
            gold[k] = sc
    top = sorted(gold.items(), key=lambda kv: (-kv[1], kv[0]))[:7]
    out = s.sparse_vector_search({"q": q}, k=7)
    assert [((r.conv_id, r.turn_idx), r.score)
            for r in out.itertuples()] == top


@pytest.mark.parametrize("seed", [3, 4])
def test_mget_random_key_subsets(idx, seed):
    s = IndexSearcher(idx)
    keys, _ = _corpus_tokens(s.cfg)
    rng = np.random.default_rng(seed)
    pick = [keys[i] for i in rng.integers(0, len(keys), size=12)]
    pick.insert(3, ("conv-nope", 0))
    out = s.mget(pick)
    assert list(zip(out["conv_id"], out["turn_idx"])) == pick
    assert out["found"].tolist() == [k != ("conv-nope", 0)
                                     for k in pick]


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_misra_gries_random_zipf(seed):
    from opensearch_jvector_ray.functions import heavyhitters as hh
    rng = np.random.default_rng(seed)
    a = float(rng.uniform(1.3, 2.2))
    vals = np.minimum(rng.zipf(a, 30_000), 5000)
    cap = int(rng.integers(32, 128))
    parts = [hh.mg_from_values(c, cap)
             for c in np.array_split(vals, 5)]
    merged = hh.mg_merge(parts, cap)
    true = pd.Series(vals).value_counts()
    err = len(vals) // (cap + 1)
    for v, est in merged.items():
        t = int(true[v])
        assert t - err <= est <= t
    for v, t in true.items():
        if t > err:
            assert v in merged


@pytest.mark.parametrize("seed", [8, 9])
def test_tdigest_random_distributions(seed):
    from opensearch_jvector_ray.functions import tdigest as td
    rng = np.random.default_rng(seed)
    vals = np.concatenate([
        rng.normal(rng.uniform(-5, 5), rng.uniform(0.5, 3), 20_000),
        rng.exponential(rng.uniform(1, 10), 20_000)])
    parts = [td.from_values(c, 150.0)
             for c in np.array_split(vals, 6)]
    m, w = td.merge(parts, 150.0)
    sv = np.sort(vals)
    for p in (0.05, 0.5, 0.95):
        est = td.quantile(m, w, p)
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - p) < 0.015, (p, rank)


@pytest.mark.parametrize("seed", [10, 11])
def test_ingest_chain_random_vs_pandas(seed):
    from opensearch_jvector_ray.pipelines.ingest import (
        compile_pipeline,
    )
    rng = np.random.default_rng(seed)
    n = 200
    texts = ["  " + "".join(rng.choice(list("aB 9c!"), size=12)) + " "
             for _ in range(n)]
    nums = rng.integers(1, 1000, size=n)
    t = pa.table({"s": texts, "n": nums})
    fn = compile_pipeline([
        {"trim": {"field": "s"}},
        {"gsub": {"field": "s", "pattern": "[0-9]+",
                  "replacement": "#"}},
        {"lowercase": {"field": "s"}},
        {"script": {"op": "mul", "left": "n", "right": 7,
                    "target_field": "n7"}},
        {"script": {"op": "div", "left": "n7", "right": "n",
                    "target_field": "r"}},
    ])
    o = fn(t)
    import re
    ref = [re.sub(r"[0-9]+", "#", x.strip()).lower() for x in texts]
    assert o["s"].to_pylist() == ref
    assert o["n7"].to_pylist() == (nums * 7).tolist()
    assert o["r"].to_pylist() == [7.0] * n


@pytest.mark.parametrize("seed", [12, 13])
def test_bloom_random_fp_rate(seed):
    from opensearch_jvector_ray.pipelines.dedup import BloomFilter
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2000, 8000))
    seen = [hashlib.md5(f"{seed}-s{i}".encode()).hexdigest()
            for i in range(n)]
    unseen = [hashlib.md5(f"{seed}-u{i}".encode()).hexdigest()
              for i in range(15000)]
    rate = float(rng.choice([0.01, 0.03]))
    bf = BloomFilter.from_hexes(seen, rate)
    assert bf.contains_hexes(seen).all()
    assert bf.contains_hexes(unseen).mean() < 3 * rate
