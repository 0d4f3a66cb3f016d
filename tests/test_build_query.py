"""End-to-end build -> query rank-identity tests vs the brute-force oracle
(the analog of the reference's exact expected docIDs+scores asserts,
`KNNJVectorTests.java:84-103`)."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.synth import generate_conversations

from tests.oracle import BruteForceBM25

QUERIES = {
    "planted": "zebra quantum nebula",
    "head": "data model search index",
    "mid": "checkpoint lineage metric",
    "dup": "data data data",
    "mixed": "the data of model",   # stopwords mixed in
}


@pytest.fixture(scope="module")
def corpus():
    return generate_conversations(np.arange(250))


@pytest.fixture(scope="module")
def oracle(corpus):
    docs = {(corpus["conv_id"][i].as_py(), corpus["turn_idx"][i].as_py()):
            corpus["text"][i].as_py() for i in range(corpus.num_rows)}
    return BruteForceBM25(docs, EngineConfig().stopwords)


@pytest.fixture(scope="module")
def index(corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "main")
    cfg = EngineConfig(num_segments=4)
    res = build_index(rd.from_arrow(corpus), idx, cfg, IndexSpec())
    assert res.num_docs == corpus.num_rows
    return idx


def assert_rank_identity(df: pd.DataFrame, oracle, queries, k):
    for qid, qtext in queries.items():
        gold = oracle.topk(qtext, k)
        got = df[df.query_id == qid].sort_values("rank")
        assert len(got) == len(gold), (qid, len(got), len(gold))
        for (key, score), row in zip(gold, got.itertuples()):
            assert (row.conv_id, row.turn_idx) == key, (qid, row, key)
            assert abs(row.score - score) < 1e-9, (qid, row.score, score)


def test_rank_identity_taat(index, oracle):
    out = IndexSearcher(index).search(QUERIES, k=12)
    assert_rank_identity(out, oracle, QUERIES, 12)


def test_wand_and_rescore_identical_to_taat(index):
    s = IndexSearcher(index)
    base = s.search(QUERIES, k=12)
    for kwargs in ({"mode": "wand"}, {"rescore_oversample": 3.0}):
        alt = s.search(QUERIES, k=12, **kwargs)
        pd.testing.assert_frame_equal(base, alt, atol=1e-9)


def test_filtered_search(index, corpus, oracle):
    allowed = {(corpus["conv_id"][i].as_py(), corpus["turn_idx"][i].as_py())
               for i in range(corpus.num_rows)
               if corpus["role"][i].as_py() == "assistant"}
    out = IndexSearcher(index).search({"q": QUERIES["head"]}, k=10,
                                      filter=pc.field("role") == "assistant")
    gold = oracle.topk(QUERIES["head"], 10, allowed=allowed)
    assert [(r.conv_id, r.turn_idx) for r in out.itertuples()] == [k for k, _ in gold]
    np.testing.assert_allclose(out.score.to_numpy(),
                               [s for _, s in gold], atol=1e-9)


def test_filtered_wand_matches_filtered_taat(index):
    s = IndexSearcher(index)
    f = pc.field("role") == "user"
    a = s.search({"q": QUERIES["head"]}, k=10, filter=f)
    b = s.search({"q": QUERIES["head"]}, k=10, filter=f, mode="wand")
    pd.testing.assert_frame_equal(a, b, atol=1e-9)


def test_missing_text_docs(tmp_path):
    """Docs with null/empty text are indexed with doc_len=0 and never match
    (reference: missing-field scenario, KNNJVectorTests.java:113-169)."""
    tbl = pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "role": ["user"] * 3,
        "text": ["hello world", None, ""],
        "tool": [""] * 3,
        "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
    })
    idx = str(tmp_path / "idx")
    res = build_index(rd.from_arrow(tbl), idx, EngineConfig(num_segments=2), IndexSpec())
    assert res.num_docs == 3 and res.num_docs_indexed == 1
    out = IndexSearcher(idx).search({"q": "hello"}, k=5)
    assert len(out) == 1 and out.iloc[0].conv_id == "c1" and out.iloc[0].turn_idx == 0


def test_input_order_invariance(corpus, index, tmp_path):
    """Index is invariant under shuffled input row order (reference sorted-
    index scenario, KNNJVectorTests.java:176-249): stable (conv_id,
    turn_idx) sort before ordinal assignment."""
    rng = np.random.default_rng(3)
    perm = rng.permutation(corpus.num_rows)
    shuffled = corpus.take(pa.array(perm))
    idx2 = str(tmp_path / "idx2")
    build_index(rd.from_arrow(shuffled), idx2, EngineConfig(num_segments=4), IndexSpec())
    a = IndexSearcher(index).search(QUERIES, k=10)
    b = IndexSearcher(idx2).search(QUERIES, k=10)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)


def test_segmentation_invariance(corpus, index, tmp_path):
    """P=1 and P=7 builds give identical query results (reference multi-
    segment scenarios, KNNJVectorTests.java:250,311,451): global df/avgdl
    make scores independent of partitioning."""
    a = IndexSearcher(index).search(QUERIES, k=15)
    for p in (1, 7):
        idx2 = str(tmp_path / f"idx_p{p}")
        build_index(rd.from_arrow(corpus), idx2,
                    EngineConfig(num_segments=p), IndexSpec())
        b = IndexSearcher(idx2).search(QUERIES, k=15)
        pd.testing.assert_frame_equal(a, b, atol=1e-12)


def test_per_turn_text_equality_invariant(tmp_path, corpus):
    """The input_hint's per-row invariant: after the engine's read ->
    partition -> (shuffled) build, every turn's text is recoverable
    unchanged under stable (conv_id, turn_idx) ordering — the index stores
    no text (derived-source, S9), so the source parquet re-read through
    the engine's own reader must match the corpus byte-for-byte."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc2
    src = str(tmp_path / "t.parquet")
    # write through a shuffled row order to prove ordering-stability
    rng = np.random.default_rng(8)
    perm = rng.permutation(corpus.num_rows)
    pq.write_table(corpus.take(pa.array(perm)), src)

    got = (rd.read_parquet(src)
           .select_columns(["conv_id", "turn_idx", "text"])
           .to_pandas()
           .sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    exp = (corpus.select(["conv_id", "turn_idx", "text"]).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)

    # and the index's doc tables enumerate exactly the same keys, in the
    # same per-segment stable order (ord asc == key asc)
    idx = str(tmp_path / "idx")
    build_index(src, idx, EngineConfig(num_segments=5), IndexSpec())
    import os
    keys = []
    for d in sorted(os.listdir(os.path.join(idx, "segments"))):
        docs = pq.read_table(os.path.join(idx, "segments", d, "docs.parquet"))
        seg_keys = list(zip(docs["conv_id"].to_pylist(),
                            docs["turn_idx"].to_pylist()))
        assert seg_keys == sorted(seg_keys)          # stable in-segment order
        keys.extend(seg_keys)
    assert sorted(keys) == list(zip(exp.conv_id, exp.turn_idx))
