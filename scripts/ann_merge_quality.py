"""Merge-mode A/B at a given scale/geometry: time + recall for
incremental, incremental+auto-polish, and rebuild merges.

The `bench.py --ann` IID-gaussian corpus is the honest FLOOR for both
NN-descent edge quality and merge polish (no cluster structure to
exploit); real embedding spaces are clustered, where descent converges
near 1.0.  This script measures both regimes so BASELINE.md can report
the pair.

`kind=lowdim` is the REALISTIC middle ground: ambient 128-d with
intrinsic dimension ~16 (latent gaussian x fixed random projection +
5% ambient noise) — the published shape of real descriptor/embedding
sets (SIFT-128's intrinsic dim is estimated ~12-16 in the
ann-benchmarks literature), where beam search is effective but the
data is not artificially clustered.  Queries are drawn from the SAME
distribution (as in every public ANN benchmark) — IID-gaussian queries
against a uniform corpus are near-orthogonal to everything at 128-d
and measure concentration-of-measure, not index quality.

Usage: python scripts/ann_merge_quality.py [n] [kind]   (default
100000 clustered; kind in {clustered, uniform, lowdim}).
Env: OJR_MERGE_REPEATS (default 3); OJR_MERGE_FACTORS (csv of
merge_factor values, default the full N_PARTS collapse) — the
merge-factor lever: factor 2 merges pairs (8 parts -> 4), factor 8
collapses to one graph.
"""
import json
import os
import shutil
import sys
import time

import numpy as np
import ray

ray.init(address="local",
         num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa                                    # noqa: E402
import pyarrow.parquet as papq                          # noqa: E402
import ray.data as rd                                   # noqa: E402
from opensearch_jvector_ray.pipelines import graph as graph_pl  # noqa: E402
from opensearch_jvector_ray.pipelines import knn as knn_pl      # noqa: E402

BENCH_ROOT = "/tmp/ojr_bench"
DIM, K, N_Q, N_PARTS = 128, 10, 100, 8

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
kind = sys.argv[2] if len(sys.argv) > 2 else "clustered"

path = os.path.join(BENCH_ROOT, f"annq_{kind}_{n}_{DIM}.parquet")
if not os.path.exists(path):
    g = np.random.default_rng(900 + n)
    if kind == "clustered":
        n_clusters = max(32, n // 1000)
        centers = g.standard_normal((n_clusters, DIM)) * 4.0
        assign = g.integers(0, n_clusters, size=n)
        mat = (centers[assign]
               + g.standard_normal((n, DIM))).astype(np.float32)
    elif kind == "lowdim":
        d_lat = 16
        proj = g.standard_normal((d_lat, DIM)) / np.sqrt(d_lat)
        mat = (g.standard_normal((n, d_lat)) @ proj
               + 0.05 * g.standard_normal((n, DIM))).astype(np.float32)
    else:
        mat = g.standard_normal((n, DIM)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), DIM).cast(pa.list_(pa.float32())),
    })
    papq.write_table(tbl, path, row_group_size=4096)

rng = np.random.default_rng(7)
queries = {f"q{i:03d}": rng.standard_normal(DIM).astype(np.float32)
           for i in range(N_Q)}
if kind in ("clustered", "lowdim"):  # queries from the same distribution
    tblq = papq.read_table(path, columns=["embedding"])
    sample = rng.choice(n, N_Q, replace=False)
    emb = tblq["embedding"].combine_chunks()
    queries = {f"q{i:03d}": (np.asarray(emb[int(s)].as_py(),
                                        dtype=np.float32)
                             + rng.standard_normal(DIM).astype(
                                 np.float32) * 0.1)
               for i, s in enumerate(sample)}

brute = knn_pl.brute_force_topk(rd.read_parquet(path), queries, K)
truth = {q: set(gg["vec_id"]) for q, gg in brute.groupby("query_id")}


def recall(df):
    got = df.groupby("query_id")["vec_id"].apply(set)
    return round(float(np.mean(
        [len(got.get(q, set()) & truth[q]) / K for q in truth])), 4)


gdir = os.path.join(BENCH_ROOT, f"annq_graph_{kind}_{n}")
if not os.path.isdir(gdir) or not os.path.exists(
        os.path.join(gdir, graph_pl.META_NAME)):
    shutil.rmtree(gdir, ignore_errors=True)
    t0 = time.perf_counter()
    graph_pl.build_graph_index(rd.read_parquet(path), gdir,
                               num_parts=N_PARTS, build_degree_mult=2)
    print(json.dumps({"build_sec": round(time.perf_counter() - t0, 2)}),
          flush=True)
pre = {"recall_ef100": recall(graph_pl.graph_topk(gdir, queries, K,
                                                  ef_search=100)),
       "recall_ef256": recall(graph_pl.graph_topk(gdir, queries, K,
                                                  ef_search=256))}
print(json.dumps({"pre_merge": pre}), flush=True)

# Merge timing is MEDIAN of OJR_MERGE_REPEATS runs (default 3): box-state
# swings (page cache, throttling) moved single-draw merge times 38-90s on
# this sandbox — raw samples are printed so outliers stay visible.  The
# merged graph is deterministic, so recall is measured once.
REPEATS = int(os.environ.get("OJR_MERGE_REPEATS", "3"))
FACTORS = [int(f) for f in os.environ.get(
    "OJR_MERGE_FACTORS", str(N_PARTS)).split(",")]
for factor in FACTORS:
    for name, kw in [("incremental", dict(mode="incremental")),
                     ("incr_polish", dict(mode="incremental",
                                          polish_sweeps="auto")),
                     ("rebuild", dict(mode="rebuild"))]:
        dst = os.path.join(BENCH_ROOT,
                           f"annq_merge_{kind}_{name}_f{factor}_{n}")
        samples = []
        for _ in range(max(1, REPEATS)):
            shutil.rmtree(dst, ignore_errors=True)
            t0 = time.perf_counter()
            graph_pl.merge_graph_index(gdir, dst, merge_factor=factor,
                                       **kw)
            samples.append(round(time.perf_counter() - t0, 2))
        print(json.dumps({f"{name}_f{factor}": {
            "sec": sorted(samples)[len(samples) // 2],
            "sec_samples": samples,
            "recall_ef100": recall(graph_pl.graph_topk(dst, queries, K,
                                                       ef_search=100)),
            "recall_ef256": recall(graph_pl.graph_topk(dst, queries, K,
                                                       ef_search=256)),
        }}), flush=True)

ray.shutdown()
