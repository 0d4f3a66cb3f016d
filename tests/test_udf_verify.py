"""Script-score UDF slot (§2.10 ScoreScript analog), integrity audit
(verify_index), and filtered search on bulk-merged segments."""

import os

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.stages.merge import merge_index
from opensearch_jvector_ray.state.manifest import verify_index
from opensearch_jvector_ray.synth import generate_conversations

from tests.oracle import BruteForceBM25


def _build(tmp_path, name, corpus, p):
    idx = str(tmp_path / name)
    build_index(rd.from_arrow(corpus), idx, EngineConfig(num_segments=p),
                IndexSpec())
    return idx


def test_score_udf_rerank(tmp_path):
    """UDF re-ranks candidates: boost assistant turns by 2x — results must
    equal BM25 scores with the same boost applied by hand."""
    corpus = generate_conversations(np.arange(120))
    idx = _build(tmp_path, "idx", corpus, 4)
    s = IndexSearcher(idx)

    def boost_assistant(hits: pd.DataFrame, docs: pd.DataFrame) -> np.ndarray:
        role = hits.merge(docs[["conv_id", "turn_idx", "role"]],
                          on=["conv_id", "turn_idx"], how="left")["role"]
        return hits["score"].to_numpy() * np.where(role == "assistant", 2.0, 1.0)

    out = s.search_with_udf({"q": "data model search"}, k=10,
                            score_udf=boost_assistant, oversample=5.0)
    # oracle: exact BM25 over all docs, boosted, top-10
    docs = {(corpus["conv_id"][i].as_py(), corpus["turn_idx"][i].as_py()):
            (corpus["text"][i].as_py(), corpus["role"][i].as_py())
            for i in range(corpus.num_rows)}
    o = BruteForceBM25({k: t for k, (t, _) in docs.items()},
                       EngineConfig().stopwords)
    scored = [(key, sc * (2.0 if docs[key][1] == "assistant" else 1.0))
              for key, sc in o.topk("data model search", 10 ** 6)]
    scored.sort(key=lambda e: (-e[1], e[0]))
    exp = scored[:10]
    assert [(r.conv_id, r.turn_idx) for r in out.itertuples()] == [k for k, _ in exp]
    np.testing.assert_allclose(out.score.to_numpy(), [sc for _, sc in exp],
                               atol=1e-9)


def test_verify_index_clean_and_corrupt(tmp_path):
    corpus = generate_conversations(np.arange(60))
    idx = _build(tmp_path, "idx", corpus, 3)
    rep = verify_index(idx)
    assert rep["ok"] and rep["segments"] == 3

    # corrupt: truncate one postings file -> audit must flag it
    victim = os.path.join(idx, "segments", "seg=00001", "postings.parquet")
    with open(victim, "r+b") as f:
        f.truncate(100)
    rep2 = verify_index(idx)
    assert not rep2["ok"]
    assert any("seg=1" in e for e in rep2["errors"])


def test_filtered_search_on_merged_segments(tmp_path):
    """J2 filter masks work over segment-major (key_rank) merged docs."""
    corpus = generate_conversations(np.arange(100))
    idx = _build(tmp_path, "fine", corpus, 8)
    merged = str(tmp_path / "m")
    merge_index(idx, merged, merge_factor=8)
    f = pc.field("role") == "assistant"
    a = IndexSearcher(idx).search({"q": "data model search"}, k=10, filter=f)
    b = IndexSearcher(merged).search({"q": "data model search"}, k=10, filter=f)
    c = IndexSearcher(merged).search({"q": "data model search"}, k=10,
                                     filter=f, mode="wand")
    pd.testing.assert_frame_equal(a, b, atol=1e-12)
    pd.testing.assert_frame_equal(b, c, atol=1e-9)
