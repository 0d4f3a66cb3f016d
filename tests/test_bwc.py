"""BWC (backward-compatibility) gate: the checked-in fixture indexes
under tests/fixtures/bwc/v1/ were written by a PAST commit — HEAD must
keep reading them rank-identically (reference analog: the
qa/restart-upgrade + qa/rolling-upgrade RecallIT suites).

This is exactly the test that protects the on-disk invariants NOTES.md
tracks (blk_n block framing, pfor patch lists, dictionary generation
layout, docs-sidecar schema).  If this test fails, EITHER the change
broke old-index reads (fix the reader) OR a format change was intended
(regenerate via scripts/make_bwc_fixture.py IN ITS OWN COMMIT and say
so; silent regeneration defeats the gate).
"""

import json
import os

import pytest

from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.state.manifest import verify_index

ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "bwc", "v1")


@pytest.fixture(scope="module")
def expected() -> dict:
    with open(os.path.join(ROOT, "expected.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_old_index_reads_rank_identical(codec, expected):
    idx = os.path.join(ROOT, f"index_{codec}")
    exp = expected[codec]
    s = IndexSearcher(idx)
    topk = s.search(expected["queries"], k=8)
    assert [int(v) for v in topk["doc_id"]] == exp["topk"]["doc_id"]
    assert [round(float(v), 6) for v in topk["score"]] == \
        exp["topk"]["score"]
    assert list(topk["query_id"]) == exp["topk"]["query_id"]
    phr = s.search({"p": "sort merge"}, k=8, mode="phrase")
    assert [int(v) for v in phr["doc_id"]] == exp["phrase_doc_id"]
    rad = s.search({"r": "alpha"}, min_score=0.3)
    assert len(rad) == exp["radial_rows"]
    stats = s.stats_agg({"q1": expected["queries"]["q1"]},
                        value_col="n_chars", min_score=1e-9)
    assert int(stats["v_sum"].iloc[0]) == exp["stats_sum"]
    assert int(stats["doc_count"].iloc[0]) == exp["stats_count"]


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_old_index_passes_integrity_audit(codec):
    audit = verify_index(os.path.join(ROOT, f"index_{codec}"))
    assert audit["ok"], audit.get("errors")


def test_old_index_merges_under_head(tmp_path, expected):
    """An old-format index must survive a HEAD-code merge and still
    rank identically (the rolling-upgrade write path)."""
    from opensearch_jvector_ray.stages.merge import merge_index
    src = os.path.join(ROOT, "index_pfor")
    work = str(tmp_path / "work")
    merge_index(src, work, merge_factor=8)
    s = IndexSearcher(work)
    topk = s.search(expected["queries"], k=8)
    exp = expected["pfor"]
    assert [int(v) for v in topk["doc_id"]] == exp["topk"]["doc_id"]
    assert [round(float(v), 6) for v in topk["score"]] == \
        exp["topk"]["score"]
