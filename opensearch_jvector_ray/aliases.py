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


class _alias_lock:
    """flock over the aliases file: put/delete are read-modify-write
    sequences — write_json_atomic makes each WRITE atomic, but two
    concurrent mutators would still read the same base dict and the
    last write would silently drop the other's alias.  Same-host
    drivers are the realistic concurrency here (alias mutation is a
    control-plane op); cross-host coordination stays out of scope."""

    def __init__(self, index_dir: str):
        self._path = _path(index_dir) + ".lock"

    def __enter__(self):
        import fcntl
        self._f = open(self._path, "w")
        fcntl.flock(self._f, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        import fcntl
        fcntl.flock(self._f, fcntl.LOCK_UN)
        self._f.close()
        return False


def put_alias(index_dir: str, name: str,
              filter_spec: dict | None = None) -> None:
    """Create or replace an alias.  The filter spec (if any) is
    validated EAGERLY — a bad spec fails at put time, not at search
    time inside a Ray task."""
    if not isinstance(name, str) or not name:
        raise ValueError("alias name must be a non-empty string")
    if filter_spec is not None:
        compile_filter(filter_spec)       # strict validation
    with _alias_lock(index_dir):
        aliases = get_aliases(index_dir)
        aliases[name] = {"filter": filter_spec}
        write_json_atomic(_path(index_dir), aliases)


def delete_alias(index_dir: str, name: str) -> None:
    with _alias_lock(index_dir):
        aliases = get_aliases(index_dir)
        if name not in aliases:
            raise KeyError(f"no alias {name!r} on {index_dir!r}")
        del aliases[name]
        write_json_atomic(_path(index_dir), aliases)


class RolloverWriter:
    """_rollover API [OpenSearch rollover public semantics]: a write
    alias points at the CURRENT generation index; after an append that
    meets the condition (``max_docs``), the alias rolls to a fresh
    generation — old generations become read-only members of the same
    logical stream.  Generations live at ``root/idx-NNNNNN`` with state
    in ``root/rollover.json`` (atomic write; resumable — re-opening a
    writer continues from the persisted generation).

    Reads span ALL generations with PER-INDEX statistics — the
    OpenSearch per-shard scoring reality — via
    ``query.indices_boost_search`` with unit boosts (round-6 cross-
    index tie rule).  Appends into the current generation ride
    ``add_segments`` (journalled, resumable); the first append of a
    generation is a fresh ``build_index``."""

    def __init__(self, root: str, cfg, spec, max_docs: int):
        if max_docs < 1:
            raise ValueError("max_docs must be >= 1")
        self.root = root
        self.cfg = cfg
        self.spec = spec
        self.max_docs = int(max_docs)
        os.makedirs(root, exist_ok=True)
        p = self._state_path()
        self.gen = int(read_json(p)["gen"]) if os.path.exists(p) else 1

    def _state_path(self) -> str:
        return os.path.join(self.root, "rollover.json")

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, f"idx-{gen:06d}")

    def indices(self) -> list[str]:
        from opensearch_jvector_ray.state.manifest import STATS_NAME
        out = []
        g = 1
        while True:
            d = self._gen_dir(g)
            if not os.path.exists(os.path.join(d, STATS_NAME)):
                break
            out.append(d)
            g += 1
        return out

    def append(self, source, lineage: dict | None = None) -> str:
        """Append rows to the current write index; roll the alias when
        the post-append doc count reaches ``max_docs``.  Returns the
        index dir the rows landed in."""
        from opensearch_jvector_ray.stages.build import (
            add_segments, build_index,
        )
        from opensearch_jvector_ray.state.manifest import STATS_NAME
        cur = self._gen_dir(self.gen)
        if os.path.exists(os.path.join(cur, STATS_NAME)):
            add_segments(cur, source, lineage=lineage)
        else:
            build_index(source, cur, self.cfg, self.spec,
                        lineage=lineage)
        n = int(read_json(os.path.join(cur, STATS_NAME))["n_docs"])
        if n >= self.max_docs:
            self.gen += 1            # roll: next append opens a new gen
        write_json_atomic(self._state_path(), {"gen": self.gen})
        return cur

    def search(self, queries: dict[str, str], k: int = 10):
        """Union search over every generation (per-index df/N/avgdl,
        the OpenSearch per-shard rule), merged on (round-6 score desc,
        index asc, key asc).  Output (query_id, rank, index, doc_key,
        score) — ``index`` is the generation dir basename."""
        from opensearch_jvector_ray.query import indices_boost_search
        searchers = {os.path.basename(d): IndexSearcher(d)
                     for d in self.indices()}
        if not searchers:
            raise ValueError("rollover stream has no built generations")
        return indices_boost_search(
            searchers, queries, {n: 1.0 for n in searchers}, k=k)


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
