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
  python -m opensearch_jvector_ray synth  --out DIR --convs N
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
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

    ad = sub.add_parser("add")
    ad.add_argument("--input", required=True)
    ad.add_argument("--index", required=True)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", action="append", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--mode", default="taat",
                   choices=["taat", "wand", "rescore", "phrase", "boolean"])
    s.add_argument("--collapse", default=None)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--merge-factor", type=int, default=8)

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)

    vf = sub.add_parser("verify")
    vf.add_argument("--index", required=True)

    sy = sub.add_parser("synth")
    sy.add_argument("--out", default="/tmp/ojr_synth")
    sy.add_argument("--convs", type=int, default=1000)

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
            res = build_index(args.input, args.index, cfg, spec,
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
            queries = {f"q{i}": q for i, q in enumerate(args.query)}
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
        elif args.cmd == "synth":
            from opensearch_jvector_ray.synth import synth_parquet
            path = synth_parquet(args.convs, root=args.out)
            print(path)
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
