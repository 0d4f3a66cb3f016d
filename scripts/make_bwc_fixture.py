"""Build the checked-in BWC (backward-compatibility) fixture: two mini
indexes (varint + pfor codecs) over a deterministic corpus, plus the
expected results of a representative query battery, all committed under
tests/fixtures/bwc/v1/.

The point (reference analog: qa/restart-upgrade RecallIT): an index
written by an OLD commit must stay readable — and rank-identical — under
every future commit.  Regenerating the fixture is a FORMAT CHANGE and
must be deliberate: run this script only when a format bump is intended,
and say so in the commit message.

Usage: PYTHONPATH=. python scripts/make_bwc_fixture.py
"""
import json
import os
import shutil

import numpy as np
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa                                    # noqa: E402
import ray.data as rd                                   # noqa: E402
from opensearch_jvector_ray.config import EngineConfig  # noqa: E402
from opensearch_jvector_ray.query import IndexSearcher  # noqa: E402
from opensearch_jvector_ray.stages.build import (       # noqa: E402
    IndexSpec, build_index,
)

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "bwc", "v1")

TEXTS = ["alpha beta sort merge", "alpha gamma merge sort",
         "beta gamma sort merge scan", "alpha beta gamma",
         "gamma delta sort", "alpha scan", "beta merge sort",
         "delta eps sort merge", "alpha delta merge", "beta delta"] * 20
N = len(TEXTS)


def corpus() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(N)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
        "n_chars": pa.array([len(t) for t in TEXTS], type=pa.int64()),
    })


QUERIES = {"q1": "alpha merge", "q2": "delta sort", "q3": "gamma"}


def battery(idx: str) -> dict:
    """The representative query battery — every number in the output is
    an exact contract the future reader must reproduce."""
    s = IndexSearcher(idx)
    out = {}
    topk = s.search(QUERIES, k=8)
    out["topk"] = {
        "doc_id": [int(v) for v in topk["doc_id"]],
        "score": [round(float(v), 6) for v in topk["score"]],
        "query_id": list(topk["query_id"]),
    }
    phr = s.search({"p": "sort merge"}, k=8, mode="phrase")
    out["phrase_doc_id"] = [int(v) for v in phr["doc_id"]]
    rad = s.search({"r": "alpha"}, min_score=0.3)
    out["radial_rows"] = int(len(rad))
    stats = s.stats_agg({"q1": "alpha merge"}, value_col="n_chars",
                        min_score=1e-9)
    out["stats_sum"] = int(stats["v_sum"].iloc[0])
    out["stats_count"] = int(stats["doc_count"].iloc[0])
    return out


shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(ROOT, exist_ok=True)
expected: dict = {"n_docs": N, "queries": QUERIES}
for codec in ("varint", "pfor"):
    idx = os.path.join(ROOT, f"index_{codec}")
    build_index(rd.from_arrow(corpus()), idx,
                EngineConfig(num_segments=3, codec=codec),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("n_chars",), ts_col=""))
    expected[codec] = battery(idx)

with open(os.path.join(ROOT, "expected.json"), "w") as f:
    json.dump(expected, f, indent=1, sort_keys=True)
print("fixture written to", ROOT)
ray.shutdown()
