"""PII detection/redaction — the curation stage every training-data
pipeline runs before anything else ships.

Vectorized, stateless, shuffle-free: ONE ``map_batches`` pass applies a
fixed, ordered list of RE2 patterns per kind (email, SSN, IPv4, E.164
phone) — counts are measured per kind on the ORIGINAL text (kind counts
are independent, not affected by earlier replacements), then the
replacements apply SEQUENTIALLY in list order.  Both pyarrow and DuckDB
compile RE2, so the generated oracle (`oracles.pii_sql`) runs the SAME
pattern strings with the same semantics — the redacted text itself is
value-exact across engines, not just the counts.

100-TB shape: no shuffle, no state, no driver materialization — the
stage streams and composes with exact_dedup / quality filters in the
same pipeline.  Patterns compile once per task via pyarrow's kernel
cache (no per-batch compile).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# (kind, RE2 pattern, replacement) — ORDER IS CONTRACT: replacements
# apply top to bottom; the oracle nests regexp_replace in the same
# order.  Patterns deliberately avoid constructs whose semantics could
# drift between RE2 frontends (no lookaround — RE2 has none — and no
# locale-dependent classes).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def _redact_batch(batch: pa.Table, text_col: str,
                  id_col: str) -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cols: dict = {id_col: batch[id_col]}
    # counts per kind on the ORIGINAL text (kind independence rule)
    for kind, pattern, _ in PII_PATTERNS:
        cols[f"n_{kind}"] = pc.cast(
            pc.count_substring_regex(text, pattern), pa.int64())
    red = text
    for _, pattern, repl in PII_PATTERNS:      # sequential, list order
        red = pc.replace_substring_regex(red, pattern, repl)
    cols["redacted"] = red
    cols["n_pii"] = pa.array(
        sum(cols[f"n_{k}"].to_numpy(zero_copy_only=False)
            for k, _, _ in PII_PATTERNS), type=pa.int64())
    return pa.table(cols)


def pii_redact(ds: "rd.Dataset", *, text_col: str = "text",
               id_col: str = "doc_id") -> "rd.Dataset":
    """(id, n_email, n_ssn, n_ipv4, n_phone, redacted, n_pii) — one
    streaming pass, no shuffle."""
    return ds.map_batches(_redact_batch, batch_format="pyarrow",
                          fn_kwargs={"text_col": text_col,
                                     "id_col": id_col})


def pii_filter(ds: "rd.Dataset", *, text_col: str = "text",
               id_col: str = "doc_id",
               max_pii: int = 0) -> "rd.Dataset":
    """Drop documents with more than ``max_pii`` total PII hits (the
    strict-curation sibling of redaction) — original columns pass
    through untouched."""
    def _f(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        total = None
        for _, pattern, _ in PII_PATTERNS:
            c = pc.cast(pc.count_substring_regex(text, pattern),
                        pa.int64())
            total = c if total is None else pc.add(total, c)
        return batch.filter(pc.less_equal(total, max_pii))
    return ds.map_batches(_f, batch_format="pyarrow")
