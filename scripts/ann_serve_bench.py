"""Warm serve-mode ANN latency at the sweep points.

The `bench.py --ann` query numbers include Ray task scheduling and a
per-batch parquet read — the right shape for throughput pipelines, but
not comparable to the reference's JMH figures (warm single-process
searches over an in-memory index, `README.md:58-72`).  The comparable
serving shape here is GraphSearchService / IVFServeService: long-lived
actors that decode a partition once and search many times.  This script
measures warm ms/op over the indexes the sweep left in /tmp/ojr_bench
(run `python bench.py --ann` first).

Usage: python scripts/ann_serve_bench.py [n ...]   (default: 100000)
"""
import json
import os
import sys
import time

import numpy as np
import ray

ray.init(address="local",
         num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")

from opensearch_jvector_ray.pipelines.graph import GraphSearchService  # noqa: E402

BENCH_ROOT = "/tmp/ojr_bench"
DIM, K, N_Q = 128, 10, 100

rng = np.random.default_rng(7)
queries = {f"q{i:03d}": rng.standard_normal(DIM).astype(np.float32)
           for i in range(N_Q)}

out = {}
for n in [int(a) for a in (sys.argv[1:] or ["100000"])]:
    gdir = os.path.join(BENCH_ROOT, f"ann_graph_{n}")
    if not os.path.isdir(gdir):
        print(f"skip {n}: {gdir} missing (run bench.py --ann)",
              file=sys.stderr)
        continue
    svc = GraphSearchService(gdir, num_shards=8)
    svc.search(queries, K, ef_search=100)          # warm (decode + JIT)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        svc.search(queries, K, ef_search=100)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    out[str(n)] = {"serve_ms_per_op": round(med / N_Q * 1e3, 3),
                   "batch_sec_median_of_5": round(med, 4)}

print(json.dumps({"metric": "ann_serve", "k": K, "n_queries": N_Q,
                  "ef_search": 100, "sizes": out}))
ray.shutdown()
