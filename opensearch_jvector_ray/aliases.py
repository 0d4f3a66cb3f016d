"""Index aliases [OpenSearch alias API public semantics].

An alias is a named pointer to an index with an optional FILTER-context
spec applied to every search through it — the filtered-alias /
multi-tenant-view pattern (`POST _aliases`, `GET <alias>/_search`).
Aliases live in ``aliases.json`` next to the index config; writes are
atomic, and the filter spec is the SAME structured object
``query_dsl.compile_filter`` validates and compiles (ONE spec drives
the engine's pyarrow pre-filter and the generated SQL predicate —
the M7 filter-representation rule).
"""

from __future__ import annotations

import os
from typing import Any

from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.query_dsl import compile_filter
from opensearch_jvector_ray.state.manifest import (
    read_json, write_json_atomic,
)

ALIASES_NAME = "aliases.json"


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, ALIASES_NAME)


def get_aliases(index_dir: str) -> dict[str, Any]:
    p = _path(index_dir)
    return read_json(p) if os.path.exists(p) else {}


def put_alias(index_dir: str, name: str,
              filter_spec: dict | None = None) -> None:
    """Create or replace an alias.  The filter spec (if any) is
    validated EAGERLY — a bad spec fails at put time, not at search
    time inside a Ray task."""
    if not isinstance(name, str) or not name:
        raise ValueError("alias name must be a non-empty string")
    if filter_spec is not None:
        compile_filter(filter_spec)       # strict validation
    aliases = get_aliases(index_dir)
    aliases[name] = {"filter": filter_spec}
    write_json_atomic(_path(index_dir), aliases)


def delete_alias(index_dir: str, name: str) -> None:
    aliases = get_aliases(index_dir)
    if name not in aliases:
        raise KeyError(f"no alias {name!r} on {index_dir!r}")
    del aliases[name]
    write_json_atomic(_path(index_dir), aliases)


def search_alias(index_dir: str, name: str, queries: dict[str, str],
                 k: int | None = None, **kwargs):
    """Search through an alias: the alias's filter (when present) is
    applied as the ordinary pre-filter — candidates restricted, global
    df/N/avgdl untouched (the J2/M7 rule).  Extra search kwargs pass
    through; combining an alias filter with an explicit ``filter=`` is
    rejected (OpenSearch ANDs them; this engine keeps the conflict
    explicit rather than silently merging)."""
    aliases = get_aliases(index_dir)
    if name not in aliases:
        raise KeyError(f"no alias {name!r} on {index_dir!r}")
    spec = aliases[name].get("filter")
    if spec is not None and kwargs.get("filter") is not None:
        raise ValueError("alias already carries a filter; pass the "
                         "extra predicate inside the alias spec")
    s = IndexSearcher(index_dir)
    if spec is not None:
        kwargs["filter"] = compile_filter(spec)
    return s.search(queries, k=k, **kwargs)
