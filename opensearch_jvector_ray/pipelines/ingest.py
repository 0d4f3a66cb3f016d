"""Ingest pipelines: OpenSearch ingest-processor chains over Arrow batches.

OpenSearch runs a named chain of ingest processors on every doc before
indexing (`PUT _ingest/pipeline` + `_simulate`; the reference plugin's
docs ride the same ingest layer).  Here a pipeline is a validated list
of processor specs compiled ONCE into a single vectorized ``map_batches``
stage — one pass over each batch applies the whole chain with
pyarrow.compute kernels (RE2 regexes, no Python per row), so adding a
pipeline costs one streaming map stage, never a shuffle.

Supported processors (all public OpenSearch ingest semantics):

  {"set":       {"field": f, "value": v}}          constant column
  {"remove":    {"field": f}}
  {"rename":    {"field": f, "target_field": g}}
  {"lowercase": {"field": f}} / {"uppercase": {"field": f}}
  {"trim":      {"field": f}}
  {"gsub":      {"field": f, "pattern": p, "replacement": r}}
  {"convert":   {"field": f, "type": "integer"|"double"|"string"}}
  {"script":    {"op": "add"|"sub"|"mul"|"div", "left": x,
                 "right": y, "target_field": g}}
      arithmetic over columns/constants (the painless-arithmetic
      subset; div -> float64 via ONE division, integral ops stay
      int64 — the script_fields rule)
  {"drop":      {"field": f, "equals": v}}
      drop documents whose field equals v (the conditional drop
      processor; NULL never equals anything, so NULL rows are kept)
  {"json_extract": {"field": f, "key": k, "target_field": g}}
      flat-object subset of the OpenSearch `json` processor: extract
      the scalar at top-level ``key`` from a JSON string column with
      ONE shared RE2 pattern (quotes/space trimmed) — the same regex
      string the generated SQL consumes, so both sides agree even on
      malformed rows (no match -> NULL)

Processors execute in list order; each sees the previous one's output
(the OpenSearch chain rule).  Validation is eager and strict (unknown
processor names / params raise at build time, not inside Ray tasks).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

_KNOWN = {
    "set": {"field", "value"},
    "script": {"op", "left", "right", "target_field"},
    "drop": {"field", "equals"},
    "json_extract": {"field", "key", "target_field"},
    "remove": {"field"},
    "rename": {"field", "target_field"},
    "lowercase": {"field"},
    "uppercase": {"field"},
    "trim": {"field"},
    "gsub": {"field", "pattern", "replacement"},
    "convert": {"field", "type"},
}
_CONVERT_TYPES = {"integer": pa.int64(), "double": pa.float64(),
                  "string": pa.string()}


def json_key_pattern(key: str) -> str:
    """The ONE RE2 pattern both the engine kernel and the generated SQL
    use for flat json_extract: value = everything up to the next comma
    or closing brace (named group for pyarrow, group 1 for DuckDB's
    regexp_extract — same regex body).  The key is re.escape'd:
    an unescaped '(' would both crash pyarrow (unnamed group) and
    SHIFT DuckDB's capture-group numbering — breaking the shared-
    pattern invariant silently."""
    import re as _re
    return f'"{_re.escape(key)}"\\s*:\\s*(?P<v>[^,}}]+)'


def compile_pipeline(processors: "list[dict[str, Any]]"):
    """Validate a processor chain and return a batch fn applying it.

    The returned callable is stateless (patterns are RE2 strings handed
    to pyarrow kernels), so it runs in the ordinary task pool — no
    actor needed."""
    if not isinstance(processors, list) or not processors:
        raise ValueError("pipeline needs a non-empty processor list")
    specs = []
    for p in processors:
        if not isinstance(p, dict) or len(p) != 1:
            raise ValueError(f"each processor must be a one-key object, "
                             f"got {p!r}")
        (name, body), = p.items()
        if name not in _KNOWN:
            raise ValueError(f"unknown processor {name!r} (supported: "
                             f"{sorted(_KNOWN)})")
        if not isinstance(body, dict):
            raise ValueError(f"[{name}] body must be an object")
        missing = _KNOWN[name] - set(body)
        extra = set(body) - _KNOWN[name]
        if missing or extra:
            raise ValueError(f"[{name}] needs exactly {sorted(_KNOWN[name])}"
                             f" (missing {sorted(missing)}, "
                             f"unknown {sorted(extra)})")
        if name == "convert" and body["type"] not in _CONVERT_TYPES:
            raise ValueError(f"[convert] type must be one of "
                             f"{sorted(_CONVERT_TYPES)}")
        if name == "script":
            if body.get("op") not in ("add", "sub", "mul", "div"):
                raise ValueError("[script] op must be add|sub|mul|div")
            if not any(isinstance(body.get(o), str)
                       for o in ("left", "right")):
                # two constants would yield a scalar, not a column —
                # fail at build time (the eager-validation contract)
                raise ValueError("[script] needs at least one COLUMN "
                                 "operand")
        if name == "json_extract":
            k = body.get("key")
            if not isinstance(k, str) or not k or any(
                    c in k for c in '"\\{}[],:'):
                raise ValueError("[json_extract] key must be a plain "
                                 "string (no JSON structural chars)")
        for key in ("field", "target_field"):
            if key in _KNOWN[name] and (
                    not isinstance(body.get(key), str) or not body[key]):
                raise ValueError(f"[{name}] needs a non-empty {key!r}")
        specs.append((name, dict(body)))

    def _col(batch: pa.Table, f: str) -> pa.Array:
        if f not in batch.column_names:
            raise KeyError(f"ingest field {f!r} not in batch "
                           f"{batch.column_names}")
        c = batch[f]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def _replace(batch: pa.Table, f: str, arr) -> pa.Table:
        return batch.set_column(batch.column_names.index(f), f, arr)

    def _put(batch: pa.Table, f: str, arr) -> pa.Table:
        # overwrite-or-append: a bare append_column on an existing name
        # would create a silent DUPLICATE column (Arrow allows them)
        if f in batch.column_names:
            return _replace(batch, f, arr)
        return batch.append_column(f, arr)

    def apply(batch: pa.Table) -> pa.Table:
        for name, b in specs:
            if name == "set":
                v = b["value"]
                # pin the type from the constant: inferring from
                # [v] * 0 on an empty block yields null type and the
                # stream's schemas diverge
                arr = pa.array([v] * batch.num_rows,
                               type=pa.scalar(v).type)
                batch = _put(batch, b["field"], arr)
            elif name == "remove":
                batch = batch.drop_columns([b["field"]])
            elif name == "rename":
                if b["field"] not in batch.column_names:
                    raise KeyError(f"rename: no field {b['field']!r}")
                if b["target_field"] in batch.column_names:
                    raise KeyError(f"rename: target {b['target_field']!r} "
                                   f"already exists (OpenSearch rename "
                                   f"fails rather than shadowing)")
                names = [b["target_field"] if n == b["field"] else n
                         for n in batch.column_names]
                batch = batch.rename_columns(names)
            elif name == "lowercase":
                batch = _replace(batch, b["field"],
                                 pc.utf8_lower(_col(batch, b["field"])))
            elif name == "uppercase":
                batch = _replace(batch, b["field"],
                                 pc.utf8_upper(_col(batch, b["field"])))
            elif name == "trim":
                batch = _replace(batch, b["field"],
                                 pc.utf8_trim_whitespace(
                                     _col(batch, b["field"])))
            elif name == "gsub":
                batch = _replace(
                    batch, b["field"],
                    pc.replace_substring_regex(
                        _col(batch, b["field"]),
                        pattern=b["pattern"],
                        replacement=b["replacement"]))
            elif name == "script":
                # Arrow kernels, not numpy: to_numpy would promote a
                # nullable int column to float64-with-NaN, breaking the
                # 'integral ops stay int64' rule AND NULL propagation
                # (the oracle's BIGINT arithmetic emits NULL)
                kernels = {"add": pc.add, "sub": pc.subtract,
                           "mul": pc.multiply, "div": pc.divide}

                def operand(x):
                    return _col(batch, x) if isinstance(x, str) \
                        else pa.scalar(x)
                l, r = operand(b["left"]), operand(b["right"])
                if b["op"] == "div":
                    # ONE float64 division (IEEE semantics), never the
                    # Arrow integer-division kernel
                    l = pc.cast(l, pa.float64())
                    r = pc.cast(r, pa.float64())
                v = kernels[b["op"]](l, r)
                if pa.types.is_integer(v.type):
                    v = pc.cast(v, pa.int64())     # width-stable
                batch = _put(batch, b["target_field"], v)
            elif name == "drop":
                col = _col(batch, b["field"])
                eq = pc.equal(col, b["equals"])
                keep = pc.invert(pc.fill_null(eq, False))
                batch = batch.filter(keep)
            elif name == "json_extract":
                pat = json_key_pattern(b["key"])
                m = pc.extract_regex(_col(batch, b["field"]), pat)
                raw = pc.struct_field(m, "v")
                # trim surrounding whitespace then one layer of quotes;
                # an empty extracted value normalizes to NULL — the
                # oracle's NULLIF rule, and '' would crash a downstream
                # convert-to-integer where the oracle yields NULL
                raw = pc.utf8_trim_whitespace(raw)
                raw = pc.utf8_trim(raw, '"')
                raw = pc.if_else(pc.equal(raw, ""),
                                 pa.scalar(None, pa.string()), raw)
                batch = _put(batch, b["target_field"], raw)
            elif name == "convert":
                batch = _replace(
                    batch, b["field"],
                    pc.cast(_col(batch, b["field"]),
                            _CONVERT_TYPES[b["type"]]))
        return batch

    return apply


def simulate(ds, processors: "list[dict[str, Any]]"):
    """_ingest/pipeline/_simulate analog: apply the chain to a Dataset
    and return the transformed Dataset (streaming — callers sink it or
    feed it to build_index for the ingest-on-index path)."""
    return ds.map_batches(compile_pipeline(processors),
                          batch_format="pyarrow")
