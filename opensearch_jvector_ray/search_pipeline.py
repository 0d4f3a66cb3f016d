"""Search pipelines: OpenSearch search-pipeline processors.

OpenSearch 2.x runs a named chain of processors around every search
(`PUT _search/pipeline`): REQUEST processors rewrite the query before
execution, RESPONSE processors rewrite the hit list after.  Here a
pipeline is a validated spec compiled once; running it is ordinary
library composition — the request side adjusts the search call's
arguments (filter, k), the response side is vectorized pandas over the
result frame.  Everything is strict-validated at compile time (the
ingest-pipeline rule: bad specs fail at build, not inside tasks).

Request processors:
  {"filter_query": {"filter": <M7 structured filter spec>}}
      AND a filter-context predicate into the request (the OpenSearch
      filter_query processor; conflicts with an explicit filter are
      rejected — the alias rule).
  {"oversample": {"factor": F}}
      multiply the requested k (the oversample processor — feeds a
      downstream truncate/rerank).

Response processors:
  {"truncate_hits": {"size": N}}   keep the best N per query, re-rank
  {"rename_field": {"field": f, "target_field": g}}
  {"collapse": {"field": f}}       keep the first (best) hit per value
"""

from __future__ import annotations

from typing import Any

_REQUEST = {"filter_query": {"filter"},
            "oversample": {"factor"}}
_RESPONSE = {"truncate_hits": {"size"},
             "rename_field": {"field", "target_field"},
             "collapse": {"field"}}


def compile_search_pipeline(spec: "dict[str, Any]") -> dict:
    """Validate {"request": [...], "response": [...]} strictly."""
    if not isinstance(spec, dict) or not spec or \
            set(spec) - {"request", "response"}:
        raise ValueError("pipeline spec needs 'request' and/or "
                         "'response' processor lists")
    out = {"request": [], "response": []}
    for side, known in (("request", _REQUEST), ("response", _RESPONSE)):
        procs = spec.get(side, [])
        if not isinstance(procs, list):
            raise ValueError(f"'{side}' must be a processor LIST, "
                             f"got {type(procs).__name__}")
        for p in procs:
            if not isinstance(p, dict) or len(p) != 1:
                raise ValueError(f"each {side} processor must be a "
                                 f"one-key object, got {p!r}")
            (name, body), = p.items()
            if name not in known:
                raise ValueError(f"unknown {side} processor {name!r} "
                                 f"(supported: {sorted(known)})")
            if not isinstance(body, dict) or set(body) != known[name]:
                raise ValueError(f"[{name}] needs exactly "
                                 f"{sorted(known[name])}")
            if name == "filter_query":
                from opensearch_jvector_ray.query_dsl import (
                    compile_filter,
                )
                compile_filter(body["filter"])    # eager validation
            if name == "oversample" and \
                    not (float(body["factor"]) >= 1.0):
                # 'not >=' also rejects NaN (all NaN comparisons are
                # False) — a NaN factor would crash inside run_search
                raise ValueError("[oversample] factor must be >= 1")
            if name == "truncate_hits" and int(body["size"]) < 1:
                raise ValueError("[truncate_hits] size must be >= 1")
            if name == "rename_field" and body["field"] in (
                    "query_id", "rank"):
                # structural columns later processors groupby on
                raise ValueError("[rename_field] cannot rename the "
                                 "structural query_id/rank columns")
            out[side].append((name, dict(body)))
    return out


def run_search(searcher, queries: dict[str, str], k: int,
               pipeline: dict, **kwargs):
    """Execute a search through a compiled pipeline: request processors
    rewrite (filter, k), the ordinary engine search runs once, response
    processors rewrite the frame (vectorized; ranks recomputed after
    truncate/collapse so the output honours the engine's (score desc,
    key asc) order)."""
    from opensearch_jvector_ray.query_dsl import compile_filter
    eff_k = k
    for name, body in pipeline["request"]:
        if name == "filter_query":
            if kwargs.get("filter") is not None:
                raise ValueError("request already carries a filter; "
                                 "put the predicate in the pipeline "
                                 "or the request, not both")
            kwargs["filter"] = compile_filter(body["filter"])
        elif name == "oversample":
            eff_k = int(eff_k * float(body["factor"]))
    out = searcher.search(queries, k=eff_k, **kwargs)
    for name, body in pipeline["response"]:
        if name == "truncate_hits":
            out = out.groupby("query_id", sort=False) \
                .head(int(body["size"])).reset_index(drop=True)
            out["rank"] = out.groupby("query_id", sort=False) \
                .cumcount() + 1
        elif name == "rename_field":
            if body["field"] not in out.columns:
                raise ValueError(f"rename_field: no column "
                                 f"{body['field']!r}")
            out = out.rename(columns={body["field"]:
                                      body["target_field"]})
        elif name == "collapse":
            f = body["field"]
            if f not in out.columns:
                raise ValueError(f"collapse: no column {f!r}")
            out = out.drop_duplicates(
                subset=["query_id", f], keep="first") \
                .reset_index(drop=True)
            out["rank"] = out.groupby("query_id", sort=False) \
                .cumcount() + 1
    return out
