"""SearchService (persistent actors): identity with IndexSearcher and
cache behavior."""

import numpy as np
import pandas as pd
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.serve import SearchService
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.synth import generate_conversations

QUERIES = {"a": "zebra quantum nebula", "b": "data model search index",
           "c": "checkpoint lineage metric"}


def test_service_matches_index_searcher(tmp_path):
    corpus = generate_conversations(np.arange(150))
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(corpus), idx, EngineConfig(num_segments=6),
                IndexSpec())
    base = IndexSearcher(idx).search(QUERIES, k=12)
    svc = SearchService(idx, num_shards=3)
    try:
        out1 = svc.search(QUERIES, k=12)
        pd.testing.assert_frame_equal(base, out1, atol=1e-12)
        # an IDENTICAL request is now served by the request cache
        out2 = svc.search(QUERIES, k=12)
        pd.testing.assert_frame_equal(out1, out2)
        assert svc.request_cache_stats()["hits"] == 1
        # a different k misses the request cache but hits the actors'
        # decoded-postings cache (same terms)
        svc.search(QUERIES, k=5)
        stats = svc.cache_stats()
        assert sum(s["hits"] for s in stats) > 0
        assert sum(s["cached_terms"] for s in stats) > 0
    finally:
        svc.shutdown()


def test_service_unknown_terms(tmp_path):
    corpus = generate_conversations(np.arange(40))
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(corpus), idx, EngineConfig(num_segments=2),
                IndexSpec())
    svc = SearchService(idx, num_shards=2)
    try:
        out = svc.search({"q": "xyzzynotaword the of"}, k=5)
        assert out.empty
    finally:
        svc.shutdown()


def test_service_filtered_search(tmp_path):
    import pyarrow.compute as pc
    corpus = generate_conversations(np.arange(120))
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(corpus), idx, EngineConfig(num_segments=4),
                IndexSpec())
    f = pc.field("role") == "assistant"
    base = IndexSearcher(idx).search({"q": "data model search"}, k=10, filter=f)
    svc = SearchService(idx, num_shards=2)
    try:
        out = svc.search({"q": "data model search"}, k=10, filter=f)
        pd.testing.assert_frame_equal(base, out, atol=1e-12)
    finally:
        svc.shutdown()
