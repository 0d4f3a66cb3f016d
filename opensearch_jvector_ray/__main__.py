"""CLI entry point — the `ray job submit` surface (S10 analog of the
reference's REST ingestion/search/merge harness,
`scripts/jvector_index_and_search/jvector_utils/index_operations.py`).

Usage (each subcommand owns a Ray session; on a cluster, submit with
``ray job submit -- python -m opensearch_jvector_ray <cmd> ...``):

  python -m opensearch_jvector_ray build  --input DIR|FILE --index DIR
         [--segments N] [--lww] [--text-col C] [--key-cols A,B]
  python -m opensearch_jvector_ray add    --input DIR|FILE --index DIR
  python -m opensearch_jvector_ray search --index DIR --query "..."
         [--k K] [--mode taat|wand|rescore|phrase] [--collapse COL]
  python -m opensearch_jvector_ray merge  --index DIR --out DIR
         [--merge-factor N]
  python -m opensearch_jvector_ray stats  --index DIR
  python -m opensearch_jvector_ray alias  --index DIR --op put|delete|
         list|search [--name N] [--filter JSON] [--query qid=text]
  python -m opensearch_jvector_ray vacuum --index DIR [--keep N]
  python -m opensearch_jvector_ray mget   --index DIR --key K[,K2] ...
  python -m opensearch_jvector_ray count  --index DIR --query qid=text
  python -m opensearch_jvector_ray synth  --out DIR --convs N
  python -m opensearch_jvector_ray knn-build  --input FILE --index DIR
         --engine graph|ivf|pq [--num-parts N] [--cells K]
  python -m opensearch_jvector_ray knn-search --index DIR --engine ...
         --query "f1,f2,..." [--k K] [--metric cosine|l2|...] [--ef N]
  python -m opensearch_jvector_ray knn-merge  --index DIR --out DIR
         [--merge-factor N] [--mode incremental|rebuild]
         [--polish N|auto] [--quantized-insert]
         [--refine-quant-iters N]
  python -m opensearch_jvector_ray corpus --input DIR|FILE --out DIR
         --op clean|sample|split|mix|pack|lm-score|turn-dedup|assemble
              |chunk|keywords
         [--rate R] [--salt S] [--splits train=0.8,val=0.1,test=0.1]
         [--mix src0=1.0,src1=0.5,...] [--default-rate R] [--budget N]
         [--id-col C] [--text-col C] [--source-col C]
         [--chunk-tokens N] [--overlap N] [--keywords-k N] [--kw-index DIR]
         (training-data corpus prep; output is partitioned parquet)
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray
    if not ray.is_initialized():
        # namespace: detached named actors (metrics) otherwise emit a
        # raylet warning ON STDOUT, breaking the one-JSON-line contract;
        # log_to_driver=False keeps forwarded worker logs off stdout too
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 namespace="ojr", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="opensearch_jvector_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--segments", type=int, default=8)
    b.add_argument("--lww", action="store_true")
    b.add_argument("--text-col", default="text")
    b.add_argument("--key-cols", default="conv_id,turn_idx")
    b.add_argument("--store-cols", default="role,tool,ts")
    b.add_argument("--format", default="auto",
                   choices=["auto", "parquet", "jsonl", "csv"],
                   help="input format; jsonl/csv are read into a Dataset "
                        "(the bulk-JSON ingestion analog), parquet uses "
                        "the zero-shuffle fragment build")

    ad = sub.add_parser("add")
    ad.add_argument("--input", required=True)
    ad.add_argument("--index", required=True)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", action="append", default=None)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--mode", default="taat",
                   choices=["taat", "wand", "rescore", "phrase", "boolean"])
    s.add_argument("--collapse", default=None)
    s.add_argument("--dsl", default=None,
                   help="JSON query body (match | bool); overrides --query")
    s.add_argument("--highlight", action="store_true",
                   help="emit matched-term positions per hit instead of "
                        "the ranked hit list")
    s.add_argument("--more-like", default=None, metavar="TEXT",
                   help="more-like-this: derive the query from a seed "
                        "text's top tf*idf terms; overrides --query")

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--merge-factor", type=int, default=8)

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)

    vf = sub.add_parser("verify")
    vf.add_argument("--index", required=True)

    sn = sub.add_parser("snapshot")
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True)

    rs = sub.add_parser("restore")
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--index", required=True)

    al = sub.add_parser("alias")
    al.add_argument("--index", required=True)
    al.add_argument("--op", required=True,
                    choices=["put", "delete", "list", "search"])
    al.add_argument("--name")
    al.add_argument("--filter", help="filter-context spec as JSON")
    al.add_argument("--query", action="append", default=[],
                    help="qid=text (repeatable, search op)")
    al.add_argument("--k", type=int, default=10)

    vc = sub.add_parser("vacuum")
    vc.add_argument("--index", required=True)
    vc.add_argument("--keep", type=int, default=1)

    mg = sub.add_parser("mget")
    mg.add_argument("--index", required=True)
    mg.add_argument("--key", action="append", required=True,
                    help="comma-joined composite key (repeatable)")

    ct = sub.add_parser("count")
    ct.add_argument("--index", required=True)
    ct.add_argument("--query", action="append", required=True,
                    help="qid=text (repeatable)")

    sy = sub.add_parser("synth")
    sy.add_argument("--out", default="/tmp/ojr_synth")
    sy.add_argument("--convs", type=int, default=1000)

    kb = sub.add_parser("knn-build")
    kb.add_argument("--input", required=True)
    kb.add_argument("--index", required=True)
    kb.add_argument("--engine", default="graph",
                    choices=["graph", "ivf", "pq", "ivfpq"])
    kb.add_argument("--num-parts", type=int, default=8)
    kb.add_argument("--cells", type=int, default=16)
    kb.add_argument("--build-degree-mult", type=int, default=1,
                    help="graph engine: descent working-degree multiplier "
                         "(2 cures the uniform-data quality plateau; only "
                         "affects partitions built by NN-descent)")
    kb.add_argument("--graph-method", default="auto",
                    choices=["auto", "exact", "descent"],
                    help="graph engine candidate generation: auto uses "
                         "EXACT chunked-BLAS KNN edges for partitions up "
                         "to 16k rows (cheaper than descent there and "
                         "candidate-perfect) and NN-descent above")
    kb.add_argument("--id-col", default="vec_id")
    kb.add_argument("--vec-col", default="embedding")
    kb.add_argument("--quant", default=None,
                    choices=["pq", "bq", "nvq", "mbq2", "mbq4"],
                    help="graph engine: traversal quantization mode "
                         "(segment-local PQ codebook, binary sign bits, "
                         "NVQ companded 8-bit scalar codes, or 2/4-bit "
                         "multi-bit scalar codes)")
    kb.add_argument("--pq-m", type=int, default=8,
                    help="graph engine --quant pq: subspace count")

    ks = sub.add_parser("knn-search")
    ks.add_argument("--index", required=True)
    ks.add_argument("--engine", default="graph",
                    choices=["graph", "ivf", "pq", "ivfpq"])
    ks.add_argument("--query", action="append", required=True,
                    help="comma-separated floats; repeatable")
    ks.add_argument("--k", type=int, default=10)
    ks.add_argument("--metric", default="cosine")
    ks.add_argument("--ef", type=int, default=64)
    ks.add_argument("--n-probe", type=int, default=4)
    ks.add_argument("--filter-ids", default=None,
                    help="comma-separated allow-list of ids (pre-filter)")
    ks.add_argument("--min-score", type=float, default=None,
                    help="radial mode: every hit scoring >= threshold")
    ks.add_argument("--max-distance", type=float, default=None,
                    help="radial mode via per-space distance translation")

    km = sub.add_parser("knn-merge")
    km.add_argument("--index", required=True)
    km.add_argument("--out", required=True)
    km.add_argument("--merge-factor", type=int, default=4)
    km.add_argument("--mode", default="incremental",
                    choices=["incremental", "rebuild"])
    km.add_argument("--polish", default="0", metavar="N|auto",
                    help="NN-descent polish sweeps over each merged "
                         "group (int, or 'auto' = to convergence); "
                         "see merge_graph_index")
    km.add_argument("--quantized-insert", action="store_true",
                    help="insert waves traverse on ADC code sums "
                         "instead of float dots (quantized "
                         "construction)")
    km.add_argument("--refine-quant-iters", type=int, default=0,
                    help="Lloyd iterations refining the leading "
                         "codebook against the merged rows")

    ka = sub.add_parser("knn-add")
    ka.add_argument("--input", required=True)
    ka.add_argument("--index", required=True)
    ka.add_argument("--engine", default="graph",
                    choices=["graph", "ivf", "ivfpq"])
    ka.add_argument("--id-col", default="vec_id")
    ka.add_argument("--vec-col", default="embedding")

    cp = sub.add_parser("corpus")
    cp.add_argument("--input", required=True)
    cp.add_argument("--out", required=True)
    cp.add_argument("--op", required=True,
                    choices=["clean", "sample", "split", "mix", "pack",
                             "lm-score", "turn-dedup", "assemble",
                             "chunk", "keywords", "pairs", "validate",
                             "novelty", "bpe-train"])
    cp.add_argument("--rate", type=float, default=0.1)
    cp.add_argument("--salt", default="")
    cp.add_argument("--splits", default="train=0.8,val=0.1,test=0.1")
    cp.add_argument("--mix", default=None,
                    help="comma list of source=rate pairs")
    cp.add_argument("--default-rate", type=float, default=0.0)
    cp.add_argument("--budget", type=int, default=2048)
    cp.add_argument("--id-col", dest="cid_col", default="doc_id")
    cp.add_argument("--text-col", dest="ctext_col", default="text")
    cp.add_argument("--source-col", default="source")
    cp.add_argument("--min-tokens", type=int, default=5)
    cp.add_argument("--chunk-tokens", type=int, default=512)
    cp.add_argument("--context-turns", type=int, default=4,
                    help="preceding-turn window for --op pairs")
    cp.add_argument("--overlap", type=int, default=64)
    cp.add_argument("--num-merges", type=int, default=50,
                    help="BPE merge count for --op bpe-train")
    cp.add_argument("--keywords-k", type=int, default=3)
    cp.add_argument("--kw-index", default=None,
                    help="index dir providing the idf dictionary for "
                         "--op keywords")

    kd = sub.add_parser("knn-delete")
    kd.add_argument("--index", required=True)
    kd.add_argument("--engine", default="graph",
                    choices=["graph", "ivf", "ivfpq"])
    kd.add_argument("--ids", required=True,
                    help="comma-separated ids to tombstone")

    args = p.parse_args(argv)
    ray = _ray_session()
    try:
        if args.cmd == "build":
            from opensearch_jvector_ray.config import EngineConfig
            from opensearch_jvector_ray.stages.build import IndexSpec, build_index
            cfg = EngineConfig(num_segments=args.segments,
                               last_write_wins=args.lww)
            spec = IndexSpec(text_col=args.text_col,
                             key_cols=tuple(args.key_cols.split(",")),
                             store_cols=tuple(c for c in args.store_cols.split(",") if c))
            fmt = args.format
            if fmt == "auto":
                low = args.input.lower()
                fmt = ("jsonl" if low.endswith((".jsonl", ".json"))
                       else "csv" if low.endswith(".csv") else "parquet")
            if fmt in ("jsonl", "csv"):
                import ray.data as rd
                src = (rd.read_json(args.input) if fmt == "jsonl"
                       else rd.read_csv(args.input))
            else:
                src = args.input
            res = build_index(src, args.index, cfg, spec,
                              lineage={"source": args.input, "cli": True})
            print(json.dumps({"num_docs": res.num_docs,
                              "num_segments": res.num_segments,
                              "segments_built": res.segments_built,
                              "segments_skipped": res.segments_skipped,
                              "build_sec": round(res.build_sec, 3)}))
        elif args.cmd == "add":
            from opensearch_jvector_ray.stages.build import add_segments
            res = add_segments(args.index, args.input,
                               lineage={"appended_from": args.input,
                                        "cli": True})
            print(json.dumps({"num_docs": res.num_docs,
                              "num_segments": res.num_segments,
                              "segments_built": res.segments_built,
                              "build_sec": round(res.build_sec, 3)}))
        elif args.cmd == "search":
            from opensearch_jvector_ray.query import IndexSearcher
            if args.dsl:
                from opensearch_jvector_ray.query_dsl import execute_query
                out = execute_query(json.loads(args.dsl),
                                    searcher=IndexSearcher(args.index))
                print(out.to_string(index=False))
                return 0
            if args.more_like:
                if args.query or args.highlight or args.collapse or \
                        args.mode != "taat":
                    p.error("--more-like is a standalone query form; it "
                            "does not combine with --query/--highlight/"
                            "--collapse/--mode")
                out = IndexSearcher(args.index).more_like_this(
                    {"q0": args.more_like}, k=args.k)
                print(out.to_string(index=False))
                return 0
            if not args.query:
                p.error("search needs --query, --dsl, or --more-like")
            queries = {f"q{i}": q for i, q in enumerate(args.query)}
            if args.highlight:
                if args.collapse or args.mode in ("rescore", "boolean"):
                    p.error("--highlight supports modes taat/wand/phrase "
                            "and no --collapse (the highlighted hit set "
                            "must be the searched hit set)")
                out = IndexSearcher(args.index).matched_positions(
                    queries, k=args.k, mode=args.mode)
                print(out.to_string(index=False))
                return 0
            kwargs = {}
            if args.mode == "rescore":
                kwargs = {"rescore_oversample": 3.0}
            out = IndexSearcher(args.index).search(
                queries, k=args.k,
                mode=args.mode if args.mode != "rescore" else "taat",
                collapse_col=args.collapse, **kwargs)
            print(out.to_string(index=False))
        elif args.cmd == "merge":
            from opensearch_jvector_ray.stages.merge import merge_index
            stats = merge_index(args.index, args.out,
                                merge_factor=args.merge_factor)
            print(json.dumps(stats))
        elif args.cmd == "stats":
            from opensearch_jvector_ray.state.metrics import engine_stats
            es = engine_stats(args.index, include_timings=True)
            print(json.dumps(es["index"]))
            print(es["segments"].to_string(index=False))
            if es["counters"]:
                print(json.dumps(es["counters"]))
        elif args.cmd == "verify":
            from opensearch_jvector_ray.state.manifest import verify_index
            report = verify_index(args.index)
            print(json.dumps(report))
            return 0 if report["ok"] else 2
        elif args.cmd == "snapshot":
            from opensearch_jvector_ray.state.manifest import (
                snapshot_index,
            )
            print(json.dumps(snapshot_index(args.index, args.out)))
            return 0
        elif args.cmd == "restore":
            from opensearch_jvector_ray.state.manifest import (
                restore_index,
            )
            print(json.dumps(restore_index(args.snapshot, args.index)))
            return 0
        elif args.cmd == "alias":
            from opensearch_jvector_ray.aliases import (
                delete_alias, get_aliases, put_alias, search_alias,
            )
            if args.op in ("put", "delete", "search") and not args.name:
                p.error(f"alias --op {args.op} needs --name")
            if args.op == "search" and not args.query:
                p.error("alias --op search needs --query qid=text")
            if args.op == "put":
                spec = json.loads(args.filter) if args.filter else None
                put_alias(args.index, args.name, spec)
                print(json.dumps({"put": args.name}))
            elif args.op == "delete":
                delete_alias(args.index, args.name)
                print(json.dumps({"deleted": args.name}))
            elif args.op == "list":
                print(json.dumps(get_aliases(args.index)))
            else:
                if any("=" not in q for q in args.query):
                    p.error("--query takes qid=text pairs")
                qs = dict(q.split("=", 1) for q in args.query)
                print(search_alias(args.index, args.name, qs,
                                   k=args.k).to_string(index=False))
        elif args.cmd == "vacuum":
            from opensearch_jvector_ray.state.manifest import (
                vacuum_dictionary,
            )
            print(json.dumps(
                {"dropped": vacuum_dictionary(args.index,
                                              keep=args.keep)}))
        elif args.cmd == "mget":
            import os as _os

            import pyarrow as _pa
            import pyarrow.parquet as _pq

            from opensearch_jvector_ray.query import IndexSearcher
            from opensearch_jvector_ray.state.manifest import DOCS_NAME
            s_ = IndexSearcher(args.index)
            # type key parts by the INDEX's key-column schema (a digit
            # heuristic would coerce digit-like string keys like
            # '0042' to int and miss the doc); arity is enforced
            schema = _pq.read_schema(
                _os.path.join(s_.seg_dirs[0], DOCS_NAME))
            ktypes = [schema.field(kc).type for kc in s_.key_cols]
            keys = []
            for k in args.key:
                parts = k.split(",")
                if len(parts) != len(s_.key_cols):
                    p.error(f"--key {k!r} has {len(parts)} parts; the "
                            f"index key is {list(s_.key_cols)}")
                typed = [int(v) if _pa.types.is_integer(t) else v
                         for v, t in zip(parts, ktypes)]
                keys.append(tuple(typed) if len(typed) > 1
                            else typed[0])
            print(s_.mget(keys).to_string(index=False))
        elif args.cmd == "count":
            from opensearch_jvector_ray.query import IndexSearcher
            if any("=" not in q for q in args.query):
                p.error("--query takes qid=text pairs")
            qs = dict(q.split("=", 1) for q in args.query)
            print(IndexSearcher(args.index).count(qs)
                  .to_string(index=False))
        elif args.cmd == "synth":
            from opensearch_jvector_ray.synth import synth_parquet
            path = synth_parquet(args.convs, root=args.out)
            print(path)
        elif args.cmd == "knn-build":
            import ray.data as rd
            ds = rd.read_parquet(args.input)
            if args.engine == "graph":
                from opensearch_jvector_ray.pipelines import graph as gpl
                gpl.build_graph_index(ds, args.index,
                                      num_parts=args.num_parts,
                                      id_col=args.id_col,
                                      vec_col=args.vec_col,
                                      build_degree_mult=args.build_degree_mult,
                                      method=args.graph_method,
                                      pq_m_subspaces=(args.pq_m if
                                                      args.quant == "pq"
                                                      else None),
                                      bq=args.quant == "bq",
                                      nvq=args.quant == "nvq",
                                      mbq_bits=(int(args.quant[3:])
                                                if (args.quant or "")
                                                .startswith("mbq")
                                                else None))
            elif args.engine == "ivf":
                from opensearch_jvector_ray.pipelines import knn as kpl
                cent = kpl.train_centroids(ds, args.cells,
                                           vec_col=args.vec_col)
                kpl.build_ivf_index(ds, args.index, centroids=cent,
                                    id_col=args.id_col,
                                    vec_col=args.vec_col)
            elif args.engine == "ivfpq":
                from opensearch_jvector_ray.pipelines import pq as ppl
                ppl.build_ivfpq_index(ds, args.index,
                                      n_centroids=args.cells,
                                      id_col=args.id_col,
                                      vec_col=args.vec_col)
            else:
                from opensearch_jvector_ray.pipelines import pq as ppl
                ppl.build_pq_index(ds, args.index, id_col=args.id_col,
                                   vec_col=args.vec_col)
            print(json.dumps({"engine": args.engine, "index": args.index}))
        elif args.cmd == "knn-search":
            import numpy as np
            queries = {f"q{i}": np.array([float(x) for x in q.split(",")])
                       for i, q in enumerate(args.query)}
            fids = (np.array([int(x) for x in args.filter_ids.split(",")])
                    if args.filter_ids else None)
            radial = {"min_score": args.min_score,
                      "max_distance": args.max_distance}
            if args.engine == "graph":
                from opensearch_jvector_ray.pipelines import graph as gpl
                out = gpl.graph_topk(args.index, queries, args.k,
                                     ef_search=args.ef,
                                     metric=args.metric, round_decimals=6,
                                     filter_ids=fids, **radial)
            elif args.engine == "ivf":
                from opensearch_jvector_ray.pipelines import knn as kpl
                out = kpl.ivf_index_topk(args.index, queries, args.k,
                                         n_probe=args.n_probe,
                                         metric=args.metric,
                                         round_decimals=6,
                                         filter_ids=fids, **radial)
            elif args.engine == "ivfpq":
                from opensearch_jvector_ray.pipelines import pq as ppl
                if args.min_score is not None or \
                        args.max_distance is not None:
                    p.error("radial mode is not supported by the ivfpq "
                            "engine (use graph or ivf)")
                out = ppl.ivfpq_topk(args.index, queries, args.k,
                                     n_probe=args.n_probe,
                                     metric=args.metric, round_decimals=6,
                                     filter_ids=fids)
            else:
                from opensearch_jvector_ray.pipelines import pq as ppl
                if fids is not None or args.min_score is not None or \
                        args.max_distance is not None:
                    p.error("filter/radial flags are not supported by the "
                            "pq engine (use graph, ivf, or ivfpq --filter-ids)")
                out = ppl.pq_rerank_topk(args.index, queries, args.k,
                                         metric=args.metric,
                                         round_decimals=6)
            print(out.to_string(index=False))
        elif args.cmd == "knn-merge":
            from opensearch_jvector_ray.pipelines import graph as gpl
            polish = (args.polish if args.polish == "auto"
                      else int(args.polish))
            gpl.merge_graph_index(args.index, args.out,
                                  merge_factor=args.merge_factor,
                                  mode=args.mode,
                                  polish_sweeps=polish,
                                  quantized_insert=args.quantized_insert,
                                  refine_quant_iters=args.refine_quant_iters)
            print(json.dumps({"merged": args.out, "mode": args.mode,
                              "polish": args.polish}))
        elif args.cmd == "knn-add":
            import ray.data as rd
            ds = rd.read_parquet(args.input)
            if args.engine == "graph":
                from opensearch_jvector_ray.pipelines import graph as gpl
                gpl.add_to_graph_index(ds, args.index)
            elif args.engine == "ivf":
                from opensearch_jvector_ray.pipelines import knn as kpl
                kpl.add_to_ivf_index(ds, args.index, id_col=args.id_col,
                                     vec_col=args.vec_col)
            else:
                from opensearch_jvector_ray.pipelines import pq as ppl
                ppl.add_to_ivfpq_index(ds, args.index, id_col=args.id_col,
                                       vec_col=args.vec_col)
            print(json.dumps({"added_into": args.index,
                              "engine": args.engine}))
        elif args.cmd == "corpus":
            import ray.data as rd
            from opensearch_jvector_ray.config import EngineConfig
            cfg = EngineConfig()
            ds = rd.read_parquet(args.input)
            idc, txc = args.cid_col, args.ctext_col
            if args.op == "clean":
                from opensearch_jvector_ray.pipelines.corpus import clean_corpus
                out = clean_corpus(ds, cfg, idc, txc,
                                   min_tokens=args.min_tokens)
            elif args.op == "sample":
                from opensearch_jvector_ray.pipelines.corpus import hash_sample
                out = hash_sample(ds, idc, args.rate, salt=args.salt)
            elif args.op == "split":
                from opensearch_jvector_ray.pipelines.corpus import hash_split
                splits = {k: float(v) for k, v in
                          (kv.split("=") for kv in args.splits.split(","))}
                out = hash_split(ds, idc, splits, salt=args.salt)
            elif args.op == "mix":
                from opensearch_jvector_ray.pipelines.corpus import mix_sources
                if not args.mix:
                    p.error("--op mix needs --mix source=rate,...")
                rates = {k: float(v) for k, v in
                         (kv.split("=") for kv in args.mix.split(","))}
                out = mix_sources(ds, idc, args.source_col, rates,
                                  salt=args.salt,
                                  default_rate=args.default_rate)
            elif args.op == "pack":
                from opensearch_jvector_ray.pipelines.corpus import pack_chunks
                out = pack_chunks(ds, cfg, idc, txc, budget=args.budget)
            elif args.op == "chunk":
                from opensearch_jvector_ray.pipelines.corpus import (
                    chunk_documents,
                )
                out = chunk_documents(ds, idc, txc,
                                      chunk_tokens=args.chunk_tokens,
                                      overlap=args.overlap)
            elif args.op == "keywords":
                from opensearch_jvector_ray.pipelines.textstats import (
                    extract_keywords,
                )
                if not args.kw_index:
                    p.error("--op keywords needs --kw-index (idf source)")
                out = extract_keywords(ds, args.kw_index, cfg, idc, txc,
                                       k=args.keywords_k)
            elif args.op == "lm-score":
                from opensearch_jvector_ray.pipelines.lm import lm_xent
                out = lm_xent(ds, cfg, idc, txc)
            elif args.op == "bpe-train":
                import ray.data as _rd

                from opensearch_jvector_ray.pipelines.corpus import bpe_train
                out = _rd.from_pandas(
                    bpe_train(ds, num_merges=args.num_merges,
                              text_col=txc))
            elif args.op == "turn-dedup":
                from opensearch_jvector_ray.pipelines.transcripts import turn_dedup
                out = turn_dedup(ds, cfg)
            elif args.op == "pairs":
                from opensearch_jvector_ray.pipelines.transcripts import (
                    context_response_pairs,
                )
                out = context_response_pairs(
                    ds, max_context_turns=args.context_turns)
            elif args.op == "novelty":
                from opensearch_jvector_ray.pipelines.transcripts import (
                    response_novelty,
                )
                out = response_novelty(
                    ds, cfg, max_context_turns=args.context_turns)
            elif args.op == "validate":
                from opensearch_jvector_ray.pipelines.transcripts import (
                    validate_conversations,
                )
                out = validate_conversations(ds)
            else:  # assemble
                from opensearch_jvector_ray.pipelines.transcripts import (
                    assemble_conversations,
                )
                out = assemble_conversations(ds)
            out.write_parquet(args.out)
            print(json.dumps({"op": args.op, "out": args.out,
                              "rows": rd.read_parquet(args.out).count()}))
        elif args.cmd == "knn-delete":
            ids = [int(x) for x in args.ids.split(",")]
            if args.engine == "graph":
                from opensearch_jvector_ray.pipelines import graph as gpl
                gpl.delete_from_graph_index(args.index, ids)
            else:
                from opensearch_jvector_ray.pipelines import knn as kpl
                kpl.delete_from_ivf_index(args.index, ids)
            print(json.dumps({"tombstoned": len(ids),
                              "engine": args.engine}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
