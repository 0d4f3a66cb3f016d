#!/usr/bin/env python
"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": <sf>, "num_cpus": N,
   "extra": {...throughputs...}}

``--scaling`` runs the flagship (index build + query batch) twice in
fresh processes at num_cpus=8 and num_cpus=32 over the SAME input and
reports both throughputs + scaling efficiency (the sandbox evidence for
the north rule's N-vs-4N-nodes criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = "/tmp/ojr_bench"


def _query_set(n: int = 50) -> dict[str, str]:
    """Deterministic query batch drawn from the synth vocabulary."""
    import numpy as np
    from opensearch_jvector_ray.synth import VOCAB_CORE
    rng = np.random.default_rng(123)
    out = {}
    for i in range(n):
        k = int(rng.integers(2, 4))
        words = rng.choice(VOCAB_CORE, size=k, replace=False)
        out[f"q{i:03d}"] = " ".join(words)
    return out


def run_bench() -> dict:
    import statistics

    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             namespace="ojr", log_to_driver=False)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd
    from opensearch_jvector_ray.config import EngineConfig
    from opensearch_jvector_ray.pipelines import dedup as dedup_pl
    from opensearch_jvector_ray.pipelines import knn as knn_pl
    from opensearch_jvector_ray.pipelines import relational as rel_pl
    from opensearch_jvector_ray.query import IndexSearcher
    from opensearch_jvector_ray.sources.tables import (
        DOCUMENTS_CFG, query_embeddings, read_table, transcripts_path)
    from opensearch_jvector_ray.stages.build import IndexSpec, build_index

    sf = float(os.path.basename(os.path.normpath(SF_DIR))[2:] or 0.1)
    REPEATS = int(os.environ.get("OJR_BENCH_REPEATS", "3"))
    phases: dict[str, float] = {}
    samples: dict[str, list] = {}
    extra: dict[str, float] = {}

    def timed(name: str, fn, repeats: int = REPEATS) -> None:
        """Per-phase MEDIAN of ``repeats`` runs — a committed BENCH_r{N}
        built from single draws judges unfairly on this shared sandbox
        (same-code run-to-run variance is 9.7-20.5s; see BASELINE.md)."""
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        samples[name] = ts
        phases[name] = round(statistics.median(ts), 3)

    # -- input: deterministic synthetic transcripts (cached, untimed) -----
    tpath = transcripts_path(SF_DIR)
    # warm the FULL worker pool (real parallel job) and the page cache, so
    # we measure compute, not process spawn / first disk read
    rd.range(NUM_CPUS * 2000).map_batches(
        lambda b: {"x": [sum(b["id"])]}, batch_size=1000).count()
    n_turns = rd.read_parquet(tpath).count()

    # -- phase 1: flagship index build ------------------------------------
    idx_dir = os.path.join(BENCH_ROOT, f"tridx_cpus{NUM_CPUS}")
    # fine segmentation: ~8k-doc segments stay cache-resident per task
    # (measured 2x faster than coarse on this box) — data-derived, so the
    # segmentation is identical at every parallelism level
    cfg = EngineConfig(num_segments=max(64, n_turns // 8000))
    res_box = {}

    def do_build():
        shutil.rmtree(idx_dir, ignore_errors=True)
        res_box["res"] = build_index(tpath, idx_dir, cfg, IndexSpec(),
                                     lineage={"source": tpath})

    timed("index_build", do_build)     # fragment mode: no shuffle
    res = res_box["res"]
    extra["build_turns_per_sec"] = round(n_turns / phases["index_build"], 1)
    extra["n_turns"] = n_turns

    # -- phase 1b: force-merge to a search-shaped segment count (S11) -----
    from opensearch_jvector_ray.stages.merge import merge_index
    merged_dir = os.path.join(BENCH_ROOT, f"trmerged_cpus{NUM_CPUS}")

    def do_merge():
        shutil.rmtree(merged_dir, ignore_errors=True)
        merge_index(idx_dir, merged_dir,
                    merge_factor=max(2, res.num_segments // 32))

    timed("force_merge", do_merge)

    # -- phase 2: query batch (50 queries, one fan-out pass) --------------
    searcher = IndexSearcher(merged_dir)
    queries = _query_set(50)
    timed("query_batch_50", lambda: searcher.search(queries, k=10))
    extra["queries_per_sec"] = round(
        len(queries) / phases["query_batch_50"], 1)

    # -- phase 3: WAND mode same batch ------------------------------------
    wand10 = dict(list(queries.items())[:10])
    timed("query_wand_10", lambda: searcher.search(wand10, k=10,
                                                   mode="wand"))

    # -- phase 3c: multi-term query surface (prefix / fuzzy / synonym /
    # facets — dictionary expansion + group scoring + facet partials) -----
    def do_multiterm():
        searcher.prefix_search({f"p{i}": "da* model" for i in range(5)},
                               k=10)
        searcher.fuzzy_search({f"f{i}": "modell serch" for i in range(5)},
                              k=10, max_edits=1)
        searcher.synonym_search({f"s{i}": "data search" for i in range(5)},
                                {"data": ["model"]}, k=10)
        searcher.facet_counts({f"a{i}": "data model" for i in range(5)},
                              facet_col="role", min_score=0.3)

    timed("query_multiterm_20", do_multiterm)

    # -- phase 3d: aggregation + join surface (radial partials,
    # combiner-first; has_child parent reduce; span proximity) ------------
    agg5 = {f"g{i}": "data model search" for i in range(5)}

    def do_aggs():
        searcher.cardinality_agg(agg5, field="role", min_score=0.3)
        searcher.percentiles_agg(agg5, value_col="turn_idx",
                                 percents=(0.5, 0.9), min_score=0.3)
        searcher.terms_stats_agg(agg5, group_col="role",
                                 value_col="turn_idx", min_score=0.3)
        searcher.has_child_search(agg5, k=10, score_mode="max")
        searcher.search(agg5, k=10, mode="span", slop=3)

    timed("query_aggs_25", do_aggs)

    # -- phase 3e: round-4 aggregation completions (composite-key /
    # moment / mask-intersection partials + field-sorted bounded top) ----
    def do_aggs2():
        searcher.multi_terms_agg(agg5, fields=["role", "tool"],
                                 min_score=0.3, size=10)
        searcher.extended_stats_agg(agg5, value_col="turn_idx",
                                    min_score=0.3)
        searcher.adjacency_matrix_agg(
            agg5, {"u": {"term": {"role": "user"}},
                   "a": {"term": {"role": "assistant"}},
                   "t": {"exists": {"field": "tool"}}}, min_score=0.3)
        searcher.top_metrics_agg(agg5, sort_col="turn_idx",
                                 metric_cols=["role"], min_score=0.3,
                                 size=3)
        searcher.percentile_ranks_agg(agg5, value_col="turn_idx",
                                      values=[2.0, 8.0], min_score=0.3)

    timed("query_aggs2_25", do_aggs2)

    # -- phase 3f: round-4 query/agg additions (sampler heads, missing,
    # auto-interval ladder, exact running distinct, per-doc-threshold
    # terms_set, additive rank_feature, span_or unions) -------------------
    def do_new2():
        searcher.sampler_agg(agg5, field="role", shard_size=50,
                             min_score=0.3)
        searcher.missing_agg(agg5, field="tool", min_score=0.3)
        searcher.auto_date_histogram_agg(agg5, ts_col="ts",
                                         target_buckets=8,
                                         min_score=0.3)
        searcher.cumulative_cardinality_agg(
            agg5, ts_col="ts", calendar_interval="hour",
            field="conv_id", min_score=0.3)
        searcher.search(agg5, k=10, terms_set={"field": "turn_idx"})
        searcher.search(agg5, k=10,
                        rank_feature={"kind": "saturation",
                                      "field": "turn_idx",
                                      "pivot": 5.0})
        searcher.search({f"o{i}": "data|model search" for i in range(5)},
                        k=10, mode="span_or", slop=3)

    timed("query_aggs3_35", do_new2)

    # -- phase 3a2: round-14 surface (ordered spans + significant_text) ---
    def do_new3():
        searcher.search({f"s{i}": "data model search" for i in range(5)},
                        k=10, mode="span_ordered", slop=3)
        searcher.search({f"w{i}": "search data model" for i in range(5)},
                        k=10, mode="span_within", slop=3)
        searcher.significant_text_agg(agg5, min_score=0.3, size=10)

    timed("query_spans_sigtext_15", do_new3)

    # -- phase 3a3: round-15 surface (linear-tf sparse vectors, count
    # partials, children agg, mget/field_stats sidecar reads) -------------
    def do_new4():
        searcher.sparse_vector_search(
            {f"v{i}": [("data", 3.0), ("model", 2.0), ("search", 1.0)]
             for i in range(5)}, k=10)
        searcher.count(agg5)
        searcher.children_terms_agg(
            {"c0": [f"conv-{i:07d}" for i in range(40)]}, field="tool")
        searcher.mget([(f"conv-{i:07d}", 0) for i in range(20)])
        searcher.field_stats(["role", "tool", "doc_len"])

    timed("query_sparse_count_30", do_new4)

    # -- phase 3a4: round-15 analytics/ingest ops over the transcripts
    # and events-shaped tables (funnel, transitions, processor chain,
    # incremental dedup) ---------------------------------------------------
    def do_new5():
        from opensearch_jvector_ray.pipelines.ingest import simulate
        from opensearch_jvector_ray.pipelines.relational import (
            events_funnel,
        )
        from opensearch_jvector_ray.pipelines.transcripts import (
            response_latency, tool_transitions,
        )
        tds = rd.read_parquet(tpath)
        tool_transitions(tds).count()
        response_latency(tds).count()
        ev = rd.read_parquet(tpath).map_batches(
            lambda b: b.select(["conv_id", "role", "ts"])
                       .rename_columns(["user_id", "event_type",
                                        "ts"]),
            batch_format="pyarrow")
        events_funnel(ev, ["user", "assistant"],
                      key_col="user_id").count()
        simulate(rd.read_parquet(tpath), [
            {"uppercase": {"field": "role"}},
            {"gsub": {"field": "text", "pattern": "[0-9]+",
                      "replacement": "#"}},
        ]).count()

    timed("corpus_analytics_10", do_new5)

    # -- phase 3b: persistent serving (warm actors + postings cache) ------
    from opensearch_jvector_ray.serve import SearchService
    # request_cache_size=0: the bench must measure actual serving work,
    # not request-cache hits (a warm cache made every repeat a
    # microsecond lookup and the phase rounded to 0.000 — BENCH_r04
    # ZeroDivisionError).  Term/postings caches stay warm: that's the
    # steady-state being measured.
    svc = SearchService(merged_dir, num_shards=min(8, NUM_CPUS),
                        request_cache_size=0)
    svc.search(dict(list(queries.items())[:5]), k=10)   # warm (untimed)

    def do_serve():
        for _ in range(3):
            svc.search(queries, k=10)

    timed("query_serve_150", do_serve)
    serve_sec = max(phases["query_serve_150"], 1e-6)   # div-by-zero guard
    extra["serve_queries_per_sec"] = round(3 * len(queries) / serve_sec, 1)
    svc.shutdown()

    # -- phase 4: documents BM25 (fresh build + search) -------------------
    doc_idx = os.path.join(BENCH_ROOT, f"docidx_cpus{NUM_CPUS}")

    def do_docs():
        shutil.rmtree(doc_idx, ignore_errors=True)
        build_index(os.path.join(SF_DIR, "documents.parquet"),
                    doc_idx, DOCUMENTS_CFG,
                    IndexSpec(text_col="text", key_cols=("doc_id",),
                              store_cols=("lang", "source", "n_chars"),
                              ts_col=""))
        IndexSearcher(doc_idx).search(
            {"q1": "fast merge sort", "q2": "query data filter join"}, k=10)

    timed("documents_bm25", do_docs)

    # -- phase 5: minhash dedup over documents ----------------------------
    timed("minhash_dedup", lambda: dedup_pl.minhash_lsh_dedup(
        read_table(SF_DIR, "documents", columns=["doc_id", "text"]),
        DOCUMENTS_CFG, "doc_id", "text", threshold=0.5,
        concurrency=max(2, NUM_CPUS // 4)))

    # -- phase 5b: simhash near-dups (md5 bits, exact 4x16 blocking) ------
    timed("simhash_dedup", lambda: dedup_pl.simhash_near_dups(
        read_table(SF_DIR, "documents", columns=["doc_id", "text"]),
        DOCUMENTS_CFG, "doc_id", "text", max_hamming=3))

    # -- phase 6: knn brute-force cosine ----------------------------------
    timed("knn_cosine", lambda: knn_pl.brute_force_topk(
        read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"]),
        query_embeddings(SF_DIR, [0, 1, 2]), 10, metric="cosine"))

    # -- phase 6b: graph-ANN build + query (the jVector-engine analog) ----
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    gidx = os.path.join(BENCH_ROOT, f"graphidx_cpus{NUM_CPUS}")

    def do_graph():
        shutil.rmtree(gidx, ignore_errors=True)
        graph_pl.build_graph_index(
            read_table(SF_DIR, "embeddings",
                       columns=["vec_id", "embedding"]),
            gidx, num_parts=min(8, NUM_CPUS))
        graph_pl.graph_topk(gidx, query_embeddings(SF_DIR, [0, 1, 2]), 10,
                            ef_search=64)

    timed("knn_graph", do_graph)

    # -- phase 6d: IVF-PQ build + two-pass query (combined scale path) ----
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    pidx = os.path.join(BENCH_ROOT, f"ivfpq_cpus{NUM_CPUS}")

    def do_ivfpq():
        shutil.rmtree(pidx, ignore_errors=True)
        pq_pl.build_ivfpq_index(
            read_table(SF_DIR, "embeddings",
                       columns=["vec_id", "embedding"]),
            pidx, n_centroids=16, m_subspaces=8, n_codes=64)
        pq_pl.ivfpq_topk(pidx, query_embeddings(SF_DIR, [0, 1, 2]), 10,
                         n_probe=4, oversample=4.0)

    timed("knn_ivfpq", do_ivfpq)

    # -- phase 6c: incremental graph merge (the reference's headline) -----
    def do_graph_merge():
        dst = os.path.join(BENCH_ROOT, f"graphmerge_cpus{NUM_CPUS}")
        shutil.rmtree(dst, ignore_errors=True)
        graph_pl.merge_graph_index(gidx, dst, merge_factor=4,
                                   mode="incremental")

    timed("graph_incremental_merge", do_graph_merge)

    # -- phase 7: relational aggregate ------------------------------------
    timed("pricing_summary", lambda: rel_pl.pricing_summary(read_table(
        SF_DIR, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])))

    # -- phase 8: training-data composite (clean -> sample -> pack) -------
    from opensearch_jvector_ray.config import EngineConfig
    from opensearch_jvector_ray.pipelines import corpus as corpus_pl
    _cfg = EngineConfig()

    def do_corpus():
        docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
        kept = corpus_pl.clean_corpus(docs, _cfg, "doc_id", "text",
                                      min_tokens=5, stop_threshold=0.1)
        n_kept = kept.count()
        sampled = corpus_pl.hash_sample(
            read_table(SF_DIR, "documents", columns=["doc_id", "text"]),
            "doc_id", 0.5, salt="bench")
        packed = corpus_pl.pack_chunks(sampled, _cfg, "doc_id", "text",
                                       budget=1024)
        n_packs = packed.count()
        return n_kept, n_packs

    timed("corpus_pipeline", do_corpus)

    # -- phase 9: quality-filter composite (gopher -> LM xent) ------------
    from opensearch_jvector_ray.pipelines import lm as lm_pl
    from opensearch_jvector_ray.pipelines import textstats as ts_pl

    def do_quality():
        docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
        flags = docs.map_batches(
            ts_pl.gopher_filter_stage(_cfg, "doc_id", "text"),
            batch_format="pyarrow")
        n_keep = int(flags.sum(on="keep"))  # vectorized aggregate
        scored = lm_pl.lm_xent(
            read_table(SF_DIR, "documents", columns=["doc_id", "text"]),
            _cfg, "doc_id", "text")
        n_scored = scored.count()
        return n_keep, n_scored

    timed("quality_pipeline", do_quality)

    ray.shutdown()
    total = round(sum(phases.values()), 3)
    extra["samples"] = samples
    extra["repeats"] = REPEATS
    return {"metric": "e2e_pipeline_sec", "value": total, "unit": "sec",
            "queries": phases, "sf": sf, "num_cpus": NUM_CPUS,
            "extra": extra}


def _scaling_child(ncpu: int, n_convs: int) -> dict:
    """One fresh-process flagship run (index build + query batch)."""
    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             namespace="ojr", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    from opensearch_jvector_ray.config import EngineConfig
    from opensearch_jvector_ray.query import IndexSearcher
    from opensearch_jvector_ray.stages.build import IndexSpec, build_index
    from opensearch_jvector_ray.synth import synth_parquet

    from opensearch_jvector_ray.stages.merge import merge_index

    tpath = synth_parquet(n_convs)
    # warm page cache + FULL worker pool (untimed): measure compute, not spawn
    rd.range(ncpu * 2000).map_batches(
        lambda b: {"x": [sum(b["id"])]}, batch_size=1000).count()
    n_turns = rd.read_parquet(tpath).count()
    idx = os.path.join(BENCH_ROOT, f"scale_idx_{ncpu}")
    merged = os.path.join(BENCH_ROOT, f"scale_merged_{ncpu}")
    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(merged, ignore_errors=True)
    # the reference lifecycle: flush many fine segments (fast, cache-
    # resident) -> force-merge to a search-shaped segment count -> search
    t0 = time.perf_counter()
    res = build_index(tpath, idx, EngineConfig(num_segments=max(64, n_turns // 8000)),
                      IndexSpec())
    build_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    merge_index(idx, merged, merge_factor=max(2, res.num_segments // 32))
    merge_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    IndexSearcher(merged).search(_query_set(50), k=10)
    query_sec = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "n_turns": n_turns,
            "build_sec": round(build_sec, 2), "merge_sec": round(merge_sec, 2),
            "query_sec": round(query_sec, 2),
            "sec": round(build_sec + merge_sec + query_sec, 2),
            "turns_per_sec": round(n_turns / (build_sec + merge_sec), 1)}


def run_scaling() -> dict:
    """The north rule's two-cluster-size criterion, evidenced as the same
    job at N and 4N CPUs in fresh processes on the SAME input.

    Reports TWO N->4N pairs: 2->8 and 8->32.  This sandbox throttles
    aggregate memory bandwidth (~0.6 GB/s; pure-streaming numpy slows 13x
    at 32 procs while CPU-bound loops scale to ~21x), so the 8->32 pair
    under-reads; 2->8 sits below the bandwidth wall and reflects the
    partitioned design's true scaling.
    """
    n_convs = int(os.environ.get("OJR_SCALE_CONVS", "400000"))
    # medians of repeated fresh-process child runs per level: same-code
    # single draws vary enough on this shared sandbox to cross the 0.8
    # bar in either direction (BASELINE.md noise note), medians don't
    repeats = int(os.environ.get("OJR_SCALING_REPEATS", "3"))
    import statistics
    results = {}
    for ncpu in (2, 8, 32):
        draws = []
        for _ in range(repeats):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_SF_DIR=SF_DIR,
                       OJR_SCALING_CHILD=str(n_convs))
            out = subprocess.run([sys.executable, os.path.abspath(__file__),
                                  "--scaling-child"],
                                 env=env, capture_output=True, text=True,
                                 check=True,
                                 cwd=os.path.dirname(os.path.abspath(__file__)))
            draws.append(json.loads(out.stdout.strip().splitlines()[-1]))
        med = dict(draws[0])
        for m in ("build_sec", "merge_sec", "query_sec", "sec",
                  "turns_per_sec"):
            med[m] = round(statistics.median(d[m] for d in draws), 2)
        med["samples"] = {m: [d[m] for d in draws]
                          for m in ("build_sec", "sec")}
        results[ncpu] = med

    def eff(metric, lo, hi):
        return round((results[lo][metric] / results[hi][metric]) / (hi / lo), 3)

    def pair(lo, hi):
        return {"build": {"sec_n": results[lo]["build_sec"],
                          "sec_4n": results[hi]["build_sec"],
                          "efficiency": eff("build_sec", lo, hi)},
                "full_lifecycle": {"sec_n": results[lo]["sec"],
                                   "sec_4n": results[hi]["sec"],
                                   "efficiency": eff("sec", lo, hi)}}

    return {
        "metric": "scaling_n_to_4n_cpus", "unit": "sec",
        "n_convs": n_convs, "n_turns": results[8]["n_turns"],
        "headline": "build",   # the north-rule metric is index-build turns/sec
        "pairs": {"2_to_8": pair(2, 8), "8_to_32": pair(8, 32)},
        "runs": results,
    }


def run_ann_sweep() -> dict:
    """Reference-parity ANN benchmark sweep.

    Mirrors the reference's JMH sweep shape (random vectors, dim=128,
    numDocs in {1k, 10k, 100k} — `FormatBenchmarkQueryWithRandomVectors
    .java:52-57`) and its OSB throughput/latency/recall story
    (`README.md:109-148`): for each corpus size, build each engine
    (graph / graph+PQ / IVF / IVF-PQ) and report build seconds, query
    ms/op over a 100-query batch (median of 3 batches), and recall@10
    vs exact brute force.  At the largest size it also times the
    incremental-vs-rebuild graph merge (the `merge_times_*.png` analog).

    Env knobs: OJR_ANN_SIZES (csv, default "1000,10000,100000"),
    OJR_ANN_DIM (default 128), OJR_ANN_MERGE=0 to skip the merge A/B,
    OJR_ANN_KIND = "gaussian" (default — the IID adversarial floor) or
    "lowdim" (ambient dim with intrinsic dim ~16 + same-distribution
    queries — the realistic embedding shape; see BASELINE round 5).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             namespace="ojr", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    from opensearch_jvector_ray.pipelines import knn as knn_pl
    from opensearch_jvector_ray.pipelines import pq as pq_pl

    sizes = [int(s) for s in os.environ.get(
        "OJR_ANN_SIZES", "1000,10000,100000").split(",")]
    dim = int(os.environ.get("OJR_ANN_DIM", "128"))
    kind = os.environ.get("OJR_ANN_KIND", "gaussian")
    if kind not in ("gaussian", "lowdim"):
        raise ValueError(f"OJR_ANN_KIND must be gaussian|lowdim, "
                         f"got {kind!r}")
    k, n_q = 10, 100
    os.makedirs(BENCH_ROOT, exist_ok=True)

    rng = np.random.default_rng(7)
    queries = {f"q{i:03d}": rng.standard_normal(dim).astype(np.float32)
               for i in range(n_q)}

    def _gen(n: int) -> np.ndarray:
        g = np.random.default_rng(1000 + n)
        if kind == "lowdim":
            # realistic embedding shape: intrinsic dim ~16 (latent
            # gaussian x fixed projection + 5% ambient noise)
            d_lat = 16
            proj = g.standard_normal((d_lat, dim)) / np.sqrt(d_lat)
            return (g.standard_normal((n, d_lat)) @ proj
                    + 0.05 * g.standard_normal((n, dim))
                    ).astype(np.float32)
        return g.standard_normal((n, dim)).astype(np.float32)

    def _data_path(n: int) -> str:
        suffix = "" if kind == "gaussian" else f"_{kind}"
        path = os.path.join(BENCH_ROOT,
                            f"ann_data_{n}_{dim}{suffix}.parquet")
        if not os.path.exists(path):
            mat = _gen(n)
            tbl = pa.table({
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1)), dim).cast(
                        pa.list_(pa.float32())),
            })
            # many row groups so read_parquet yields parallel blocks
            papq.write_table(tbl, path, row_group_size=4096)
        if kind == "lowdim":
            # queries from the data distribution (every public ANN
            # benchmark's shape) — perturbed corpus points
            qrng = np.random.default_rng(7)
            tq = papq.read_table(path, columns=["embedding"])
            emb = tq["embedding"].combine_chunks()
            # corpora smaller than the query batch sample WITH
            # replacement (choice(replace=False) would raise)
            picks = qrng.choice(n, n_q, replace=n < n_q)
            for i, s_ in enumerate(picks):
                queries[f"q{i:03d}"] = (
                    np.asarray(emb[int(s_)].as_py(), dtype=np.float32)
                    + 0.1 * qrng.standard_normal(dim).astype(np.float32))
        return path

    def _recall(df, truth) -> float:
        got = df.groupby("query_id")["vec_id"].apply(set)
        return round(float(np.mean([
            len(got.get(q, set()) & truth[q]) / k for q in truth])), 4)

    def _timed_query(fn) -> float:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    # warm the worker pool + page cache (untimed): measure compute, not spawn
    rd.range(NUM_CPUS * 2000).map_batches(
        lambda b: {"x": [sum(b["id"])]}, batch_size=1000).count()

    tag = "" if kind == "gaussian" else f"_{kind}"
    out: dict = {}
    for n in sizes:
        path = _data_path(n)
        res: dict = {}
        num_parts = 1 if n <= 2000 else (4 if n <= 20000 else 8)
        # sqrt(n)/2 cells, ~50% probed: IID-gaussian data has no cluster
        # structure, the IVF worst case — recall here is the honest
        # floor.  50% (was 25% through r04) because the probe set is the
        # recall CEILING for IVF-PQ (exact within probed cells): 25%
        # capped IVF at 0.635 @100k, under the reference's 0.75 floor
        n_cent = max(8, int(n ** 0.5) // 2)
        n_probe = max(2, n_cent // 2)

        def ds():
            return rd.read_parquet(path)

        # exact baseline (also the ground truth)
        t0 = time.perf_counter()
        brute = knn_pl.brute_force_topk(ds(), queries, k)
        brute_sec = time.perf_counter() - t0
        truth = {q: set(g["vec_id"]) for q, g in brute.groupby("query_id")}
        res["brute"] = {"build_sec": 0.0,
                        "query_ms_per_op": round(brute_sec / n_q * 1e3, 3),
                        "recall_at_10": 1.0}

        # graph (float) — method="auto" (default): these partition sizes
        # all take the exact chunked-BLAS construction path, which is
        # both cheaper than descent and candidate-perfect on this
        # IID-gaussian corpus (the NN-descent hard case)
        gdir = os.path.join(BENCH_ROOT, f"ann_graph_{n}{tag}")
        shutil.rmtree(gdir, ignore_errors=True)
        t0 = time.perf_counter()
        graph_pl.build_graph_index(ds(), gdir, num_parts=num_parts)
        b = time.perf_counter() - t0
        qsec = _timed_query(lambda: graph_pl.graph_topk(
            gdir, queries, k, ef_search=100))
        res["graph"] = {
            "build_sec": round(b, 2),
            "query_ms_per_op": round(qsec / n_q * 1e3, 3),
            "recall_at_10": _recall(
                graph_pl.graph_topk(gdir, queries, k, ef_search=100),
                truth),
            "recall_at_10_ef256": _recall(
                graph_pl.graph_topk(gdir, queries, k, ef_search=256),
                truth)}

        # graph + PQ traversal (pq_min_rows=1024: the reference's PQ
        # threshold — 1k-corpus partitions skip quantization, same rule)
        qdir = os.path.join(BENCH_ROOT, f"ann_graphpq_{n}{tag}")
        shutil.rmtree(qdir, ignore_errors=True)
        t0 = time.perf_counter()
        graph_pl.build_graph_index(ds(), qdir, num_parts=num_parts,
                                   pq_m_subspaces=min(16, dim // 4))
        b = time.perf_counter() - t0
        qsec = _timed_query(lambda: graph_pl.graph_topk(
            qdir, queries, k, ef_search=100))
        res["graph_pq"] = {
            "build_sec": round(b, 2),
            "query_ms_per_op": round(qsec / n_q * 1e3, 3),
            "recall_at_10": _recall(
                graph_pl.graph_topk(qdir, queries, k, ef_search=100),
                truth)}

        # graph + NVQ traversal (companded 8-bit scalar codes, per-row
        # affine gather-sum correction — the reference's NVQ family)
        ndir = os.path.join(BENCH_ROOT, f"ann_graphnvq_{n}{tag}")
        shutil.rmtree(ndir, ignore_errors=True)
        t0 = time.perf_counter()
        graph_pl.build_graph_index(ds(), ndir, num_parts=num_parts,
                                   nvq=True)
        b = time.perf_counter() - t0
        qsec = _timed_query(lambda: graph_pl.graph_topk(
            ndir, queries, k, ef_search=100))
        res["graph_nvq"] = {
            "build_sec": round(b, 2),
            "query_ms_per_op": round(qsec / n_q * 1e3, 3),
            "recall_at_10": _recall(
                graph_pl.graph_topk(ndir, queries, k, ef_search=100),
                truth)}

        # IVF (persisted cell layout, prune-at-the-read)
        idir = os.path.join(BENCH_ROOT, f"ann_ivf_{n}{tag}")
        shutil.rmtree(idir, ignore_errors=True)
        t0 = time.perf_counter()
        knn_pl.build_ivf_index(ds(), idir, n_centroids=n_cent)
        b = time.perf_counter() - t0
        qsec = _timed_query(lambda: knn_pl.ivf_index_topk(
            idir, queries, k, n_probe=n_probe))
        res["ivf"] = {
            "build_sec": round(b, 2),
            "query_ms_per_op": round(qsec / n_q * 1e3, 3),
            "recall_at_10": _recall(
                knn_pl.ivf_index_topk(idir, queries, k, n_probe=n_probe),
                truth)}

        # IVF-PQ (codes-only ADC first pass + exact rerank)
        pdir = os.path.join(BENCH_ROOT, f"ann_ivfpq_{n}{tag}")
        shutil.rmtree(pdir, ignore_errors=True)
        t0 = time.perf_counter()
        pq_pl.build_ivfpq_index(ds(), pdir, n_centroids=n_cent,
                                m_subspaces=min(16, dim // 4), n_codes=256)
        b = time.perf_counter() - t0
        # oversample=None -> the engine's dimension-based default +
        # min(10000, max(100, ceil(k*os))) first-pass clamp
        # (RescoreContext.java:17-97) — the sweep measures the DEFAULTS
        qsec = _timed_query(lambda: pq_pl.ivfpq_topk(
            pdir, queries, k, n_probe=n_probe))
        res["ivfpq"] = {
            "build_sec": round(b, 2),
            "query_ms_per_op": round(qsec / n_q * 1e3, 3),
            "recall_at_10": _recall(
                pq_pl.ivfpq_topk(pdir, queries, k, n_probe=n_probe),
                truth)}

        # merge A/B at the largest size (the merge_times_*.png analog).
        # OJR_ANN_MERGE: "1"/"both" = A/B both modes; "incremental" or
        # "rebuild" = that mode only (a single-partition rebuild at 100k
        # is deliberately pathological — that asymmetry IS the result —
        # so the knob lets a time-boxed run measure just one arm); "0"
        # = skip.
        merge_env = os.environ.get("OJR_ANN_MERGE", "1")
        modes = {"1": ("incremental", "rebuild"),
                 "both": ("incremental", "rebuild"),
                 "incremental": ("incremental",),
                 "rebuild": ("rebuild",)}.get(merge_env, ())
        if n == max(sizes):
            # merge timing = median of OJR_ANN_MERGE_REPEATS (default 3):
            # single-draw merge times swung 38-90s with box state; raw
            # samples are recorded so outliers stay visible
            m_reps = max(1, int(os.environ.get("OJR_ANN_MERGE_REPEATS",
                                               "3")))
            for mode in modes:
                dst = os.path.join(BENCH_ROOT, f"ann_merge_{mode}_{n}{tag}")
                samples = []
                for _ in range(m_reps):
                    shutil.rmtree(dst, ignore_errors=True)
                    t0 = time.perf_counter()
                    graph_pl.merge_graph_index(gdir, dst,
                                               merge_factor=num_parts,
                                               mode=mode)
                    samples.append(round(time.perf_counter() - t0, 2))
                res[f"graph_merge_{mode}_sec"] = sorted(
                    samples)[len(samples) // 2]
                res[f"graph_merge_{mode}_sec_samples"] = samples
                # merged-graph quality: the headline feature end-to-end
                res[f"graph_merge_{mode}_recall_at_10"] = _recall(
                    graph_pl.graph_topk(dst, queries, k, ef_search=100),
                    truth)
                res[f"graph_merge_{mode}_recall_at_10_ef256"] = _recall(
                    graph_pl.graph_topk(dst, queries, k, ef_search=256),
                    truth)

        out[str(n)] = res
        # partial results survive a killed/timed-out run (stderr so the
        # final stdout JSON line stays the only stdout output)
        print(json.dumps({"ann_partial": {str(n): res}}),
              file=sys.stderr, flush=True)

    ray.shutdown()
    return {"metric": "ann_sweep", "unit": "mixed", "dim": dim,
            "kind": kind, "k": k,
            "n_queries": n_q, "num_cpus": NUM_CPUS, "sizes": out}


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        print(json.dumps(_scaling_child(NUM_CPUS,
                                        int(os.environ["OJR_SCALING_CHILD"]))))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--ann" in sys.argv:
        print(json.dumps(run_ann_sweep()))
    else:
        print(json.dumps(run_bench()))
