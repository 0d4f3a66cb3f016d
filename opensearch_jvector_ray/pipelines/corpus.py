"""Composite corpus-cleaning pipeline — the canonical LLM-training-data
chain expressed as ONE streaming Ray Data pipeline:

    quality filter (min token count)
      -> language filter (stopword-ratio heuristic, 'en' only)
      -> exact dedup (md5 of analyzer-normalized text, keep the min-id
         canonical row)
      -> (doc_id, n_tokens) survivors

One fused map_batches does tokenize + quality + language + hash (a
single pass over the text), then one narrow groupby(text_hash) shuffle
picks canonicals — rows carry (hash, id, n_tokens) only, never text.
The DuckDB oracle reproduces the same chain symbol-for-symbol (same
split pattern, stop list, 6dp ratio rounding, min-id tie rule), so the
whole composite is a HARD driver gate, not just its parts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines.textstats import (
    _token_lists, normalized_text,
)


def clean_corpus(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                 text_col: str, *, min_tokens: int = 5,
                 stop_threshold: float = 0.1) -> "rd.Dataset":
    """Returns a Dataset of (id_col, n_tokens) survivors of the
    quality -> language -> exact-dedup chain (canonical = min id among
    surviving duplicates, the exact_dedup rule)."""
    stop_set = pa.array(list(cfg.stopwords), type=pa.string())

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks() \
            if isinstance(batch[text_col], pa.ChunkedArray) \
            else batch[text_col]
        lists = _token_lists(texts, cfg)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        n = batch.num_rows
        total = np.bincount(parents, minlength=n).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=stop_set).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(parents[is_stop], minlength=n)
        ratio = np.round(n_stop / np.maximum(total, 1), 6)
        keep = (total >= min_tokens) & (ratio >= stop_threshold)
        norm = normalized_text(texts, cfg)
        hs = [hashlib.md5(s.encode()).hexdigest()
              for s in norm.to_pylist()]
        out = pa.table({
            "text_hash": pa.array(hs, type=pa.string()),
            id_col: batch[id_col],
            "n_tokens": pa.array(total),
        })
        return out.filter(pa.array(keep))

    return (ds.map_batches(stage, batch_format="pyarrow")
              .groupby("text_hash")
              .aggregate(Min(id_col, alias_name=id_col),
                         Min("n_tokens", alias_name="n_tokens"))
              .drop_columns(["text_hash"]))
