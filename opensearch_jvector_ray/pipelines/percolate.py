"""Percolator: reverse search [OpenSearch percolate-query public
semantics — the percolator field type].  A REGISTERED query set is
matched against a STREAM of documents: instead of "which docs match
this query", "which stored queries match each doc" — the routing /
alerting / tagging primitive.

Ray shape: the compiled query term sets are tiny and ship once per task
via fn_kwargs (broadcast, never per-row); documents stream through
``map_batches`` as zero-copy Arrow batches; per batch the token stream
is flattened ONCE (the indexing analyzer chain, `analyze.tokenize`) and
every query is evaluated with one vectorized ``is_in`` over the flat
term array — no per-row Python loop, per-query work is
O(tokens_in_batch).

match_mode:
  ``any``  a doc matches a query if it contains ANY analyzed query term
           (the match/OR semantics)
  ``all``  a doc must contain EVERY distinct analyzed query term
           (the AND semantics)

The DuckDB oracle (`oracles.percolate_sql`) computes the same predicate
from the same analyzed term sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from opensearch_jvector_ray.analyze import analyze_query, tokenize
from opensearch_jvector_ray.config import EngineConfig


def compile_queries(queries: dict[str, str], cfg: EngineConfig,
                    phrase: bool = False) -> dict[str, list[str]]:
    """qid -> analyzed terms (empty queries dropped — a query with no
    surviving terms matches nothing).  Default: sorted distinct set
    (any/all modes); ``phrase``: the full sequence in order, duplicates
    kept (adjacency needs slots)."""
    out = {}
    for qid, text in sorted(queries.items()):
        terms = analyze_query(text, cfg)
        if not phrase:
            terms = sorted(set(terms))
        if terms:
            out[qid] = terms
    return out


def _percolate_batch(batch: pa.Table, *, compiled: dict[str, list[str]],
                     cfg: EngineConfig, id_col: str, text_col: str,
                     match_mode: str,
                     filter_exprs: dict | None = None) -> pa.Table:
    stream = tokenize(batch[text_col], cfg)
    doc_idx = stream.doc_idx
    ids = batch[id_col]
    out_ids: list[pa.Array] = []
    out_qids: list[str] = []
    n_rows = 0
    # filter-context clauses: one vectorized row-mask per filtered
    # query per batch (the search path's __ord trick); a query's text
    # matches then intersect with its allowed row set
    allowed: dict[str, np.ndarray] = {}
    if filter_exprs:
        with_ord = batch.append_column(
            "__ord", pa.array(np.arange(batch.num_rows,
                                        dtype=np.int64)))
        for fq, expr in filter_exprs.items():
            allowed[fq] = with_ord.filter(expr)["__ord"].to_numpy(
                zero_copy_only=False)
    # pure-filter queries (no surviving text terms): match = the
    # filter mask itself — the percolator's filter-only query body
    for fq in sorted(allowed):
        if fq in compiled:
            continue
        rows = allowed[fq]
        if len(rows):
            out_ids.append(ids.take(pa.array(rows.astype(np.int64))))
            out_qids.extend([fq] * len(rows))
            n_rows += len(rows)
    if match_mode == "phrase":
        # exact-phrase percolation [Lucene PhraseQuery predicate on the
        # percolator side]: a doc matches iff the analyzed sequence
        # occurs at ADJACENT pre-stopword positions (a stopword between
        # phrase words breaks adjacency — the engine-wide phrase rule).
        # Per slot j: candidate starts s = pos(t_j) - j; a match start
        # is a (doc, s) key present in EVERY slot — one intersect1d per
        # slot, no per-row loop.
        pos = stream.positions.astype(np.int64)
        docs64 = doc_idx.astype(np.int64)
        big = (int(pos.max()) + 2) if len(pos) else 1
        for qid, qseq in compiled.items():
            acc = None
            for j, t in enumerate(qseq):
                m = pc.equal(stream.terms, t).to_numpy(
                    zero_copy_only=False)
                s = pos[m] - j
                ok = s >= 0
                keys = docs64[m][ok] * big + s[ok]
                acc = keys if acc is None else \
                    np.intersect1d(acc, keys)
                if not len(acc):
                    break
            if acc is None or not len(acc):
                continue
            rows = np.unique(acc // big)
            if qid in allowed:
                rows = np.intersect1d(rows, allowed[qid])
                if not len(rows):
                    continue
            out_ids.append(ids.take(pa.array(rows.astype(np.int64))))
            out_qids.extend([qid] * len(rows))
            n_rows += len(rows)
        if not n_rows:
            return pa.table({id_col: pa.array([], type=ids.type),
                             "query_id": pa.array([], type=pa.string())})
        return pa.table({
            id_col: pa.concat_arrays([a.combine_chunks()
                                      if isinstance(a, pa.ChunkedArray)
                                      else a for a in out_ids]),
            "query_id": pa.array(out_qids, type=pa.string()),
        })
    for qid, qterms in compiled.items():
        hit = pc.is_in(stream.terms,
                       value_set=pa.array(qterms)).to_numpy(
                           zero_copy_only=False)
        if not hit.any():
            continue
        sub = doc_idx[hit]
        if match_mode == "any":
            rows = np.unique(sub)
        else:
            # distinct (doc, term) pairs -> per-doc distinct-term count
            codes = pc.index_in(
                stream.terms.filter(pa.array(hit)),
                value_set=pa.array(qterms)).to_numpy(
                    zero_copy_only=False)
            pair = sub.astype(np.int64) * len(qterms) + codes
            uniq = np.unique(pair)
            d, cnt = np.unique(uniq // len(qterms), return_counts=True)
            rows = d[cnt == len(qterms)]
        if qid in allowed:
            rows = np.intersect1d(rows, allowed[qid])
        if len(rows):
            out_ids.append(ids.take(pa.array(rows.astype(np.int64))))
            out_qids.extend([qid] * len(rows))
            n_rows += len(rows)
    if not n_rows:
        return pa.table({id_col: pa.array([], type=ids.type),
                         "query_id": pa.array([], type=pa.string())})
    return pa.table({
        id_col: pa.concat_arrays([a.combine_chunks()
                                  if isinstance(a, pa.ChunkedArray)
                                  else a for a in out_ids]),
        "query_id": pa.array(out_qids, type=pa.string()),
    })


def percolate(ds: "rd.Dataset", queries: dict[str, str],
              cfg: EngineConfig, id_col: str = "doc_id",
              text_col: str = "text",
              match_mode: str = "any",
              filters: "dict[str, dict] | None" = None) -> "rd.Dataset":
    """Match the registered ``queries`` against every doc of ``ds``;
    returns a Dataset of (id_col, query_id) match pairs.

    ``filters`` (qid -> filter-context spec, the M7 structured object
    ``query_dsl.compile_filter`` validates) ANDs a metadata predicate
    into that query — the percolator's full query-body reality (text
    clause + filter clause).  A query whose text analyzes to NOTHING
    but carries a filter is a pure-filter percolation (matches = the
    filter mask).  Specs compile eagerly driver-side; the compiled
    expressions broadcast once per task."""
    if match_mode not in ("any", "all", "phrase"):
        raise ValueError("match_mode must be any|all|phrase")
    compiled = compile_queries(queries, cfg,
                               phrase=(match_mode == "phrase"))
    filter_exprs = None
    if filters:
        from opensearch_jvector_ray.query_dsl import compile_filter
        unknown = set(filters) - set(queries)
        if unknown:
            raise ValueError(f"filters for unregistered queries: "
                             f"{sorted(unknown)}")
        filter_exprs = {qid: compile_filter(spec)
                        for qid, spec in sorted(filters.items())}
    return ds.map_batches(
        _percolate_batch, batch_format="pyarrow",
        fn_kwargs={"compiled": compiled, "cfg": cfg, "id_col": id_col,
                   "text_col": text_col, "match_mode": match_mode,
                   "filter_exprs": filter_exprs})
