"""Text-analysis pipelines over a document table: token counts, quality
scoring, language-ID heuristic, document fingerprinting.

These are first-class training-data-pipeline operators (not in the
reference, which delegates text analysis to Lucene — the analyzer
semantics here are shared with `analyze.py` so index and corpus-analytics
agree).  Every function is a vectorized ``map_batches`` stage over Arrow
batches; each has an exactly-matching DuckDB SQL oracle built by
``__ray_entry__.oracle_sql`` (same RE2 split pattern, same stop list,
same rounding).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from opensearch_jvector_ray.analyze import tokenize
from opensearch_jvector_ray.config import EngineConfig


def _token_lists(texts: pa.Array, cfg: EngineConfig,
                 pre_tokenized: bool = False) -> pa.Array:
    """list<string> of non-empty lowered tokens per doc (stopwords KEPT —
    callers decide; order preserved).  ``pre_tokenized`` skips the RE2
    pass for texts that are already analyzer-normalized (tokens joined
    by single spaces, e.g. ``normalized_text`` output) — a whitespace
    split is then token-identical and ~10x cheaper."""
    if pre_tokenized:
        lists = pc.utf8_split_whitespace(texts)
    else:
        lowered = pc.utf8_lower(texts) if cfg.lowercase else texts
        lists = pc.split_pattern_regex(lowered, pattern=cfg.split_pattern)
    # drop empty strings but keep list structure
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parents = parents[keep]
    counts = np.bincount(parents, minlength=len(texts))
    offsets = np.zeros(len(texts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), flat)


def token_count_stage(cfg: EngineConfig, id_col: str, text_col: str):
    """(id, n_tokens) — tokens AFTER stopword removal (matches doc_len)."""
    def fn(batch: pa.Table) -> pa.Table:
        stream = tokenize(batch[text_col], cfg)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(stream.doc_len.astype(np.int64)),
        })
    return fn


# BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct runs with
# common English contractions split off; RE2-safe — no lookarounds — so
# pyarrow and DuckDB count matches identically from the SAME string).
BPE_PATTERN = r"'(?:s|d|m|t|ll|ve|re)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s']+"


def bpe_count_stage(id_col: str, text_col: str,
                    pattern: str = BPE_PATTERN):
    """(id, n_ws_tokens, n_bpe_tokens) — whitespace-token count plus a
    BPE-style pre-tokenizer match count (the LLM-budget proxy: BPE
    subword counts are ~1.3x the pre-token count on English text).
    Two vectorized RE2 passes per batch; the DuckDB oracle shares both
    pattern strings verbatim (`len(regexp_extract_all(...))`)."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.table({
            id_col: batch[id_col],
            "n_ws_tokens": pc.cast(
                pc.count_substring_regex(texts, pattern=r"\S+"),
                pa.int64()),
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(texts, pattern=pattern),
                pa.int64()),
        })
    return fn


def quality_stage(cfg: EngineConfig, id_col: str, text_col: str):
    """Quality signals: total tokens, stopword ratio, mean token length,
    all round(6) for oracle parity."""
    stop_set = pa.array(list(cfg.stopwords), type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        lists = _token_lists(batch[text_col].combine_chunks()
                             if isinstance(batch[text_col], pa.ChunkedArray)
                             else batch[text_col], cfg)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        total = np.bincount(parents, minlength=n).astype(np.float64)
        is_stop = pc.is_in(flat, value_set=stop_set).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parents[is_stop], minlength=n).astype(np.float64)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
        sum_len = np.zeros(n, dtype=np.float64)
        np.add.at(sum_len, parents, tok_len)
        safe = np.maximum(total, 1.0)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens_all": pa.array(total.astype(np.int64)),
            "stop_ratio": pa.array(np.round(n_stop / safe, 6)),
            "mean_token_len": pa.array(np.round(sum_len / safe, 6)),
        })
    return fn


def lang_id_stage(cfg: EngineConfig, id_col: str, text_col: str,
                  threshold: float = 0.1):
    """N-gram-free language-ID heuristic: English iff stopword ratio >=
    threshold (deterministic; the SQL oracle uses the same CASE)."""
    quality = quality_stage(cfg, id_col, text_col)

    def fn(batch: pa.Table) -> pa.Table:
        q = quality(batch)
        pred = pc.if_else(pc.greater_equal(q["stop_ratio"], pa.scalar(threshold)),
                          pa.scalar("en"), pa.scalar("other"))
        return pa.table({id_col: q[id_col], "pred_lang": pred})
    return fn


def fingerprint_stage(cfg: EngineConfig, id_col: str, text_col: str):
    """Document fingerprint: md5 hex of the space-joined normalized token
    sequence (stopwords kept — a canonical-form fingerprint, whitespace/
    punctuation-insensitive).  DuckDB oracle:
    md5(array_to_string(list_filter(regexp_split_to_array(lower(text), P),
    x -> x <> ''), ' '))."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        lists = _token_lists(col, cfg)
        joined = pc.binary_join(lists, " ")
        # NULL text fingerprints to NULL — _token_lists rebuilds the
        # list column without a validity mask, so the joined string for
        # a null row is '' (not None) and would hash identically to an
        # EMPTY-text doc, while the oracle's md5(NULL) propagates NULL
        # (the CLAUDE.md no-drift rule); gate on the INPUT's validity
        valid = pc.is_valid(col).to_pylist()
        fps = [hashlib.md5(s.encode()).hexdigest() if v else None
               for s, v in zip(joined.to_pylist(), valid)]
        return pa.table({id_col: batch[id_col],
                         "fingerprint": pa.array(fps, type=pa.string())})
    return fn


def _distinct_token_bigram_counts(parents: np.ndarray, flat: pa.Array,
                                  n: int
                                  ) -> tuple[np.ndarray, np.ndarray]:
    """(distinct tokens per doc, distinct word-bigrams per doc) —
    the ONE copy of the exactness-critical method shared by
    repetition_stage and gopher_filter_stage: Arrow dictionary-encode
    (per-batch integer codes, no hash collisions, so the DuckDB
    string-distinct oracle matches bit-for-bit) -> lexsort ->
    first-in-run counts; bigram keys pack the code pair into one int64
    (V^2 < 2^63 for any realistic per-batch vocab), a window is valid
    iff both tokens share a parent doc."""
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def distinct_per_doc(doc: np.ndarray, key: np.ndarray) -> np.ndarray:
        if not len(doc):
            return np.zeros(n, dtype=np.int64)
        order = np.lexsort((key, doc))
        d_s, k_s = doc[order], key[order]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
        return np.bincount(d_s[first], minlength=n).astype(np.int64)

    dt = distinct_per_doc(parents, codes)
    if len(codes) >= 2:
        v = np.int64(len(enc.dictionary) + 1)
        same = parents[1:] == parents[:-1]
        bg = (codes[:-1] * v + codes[1:])[same]
        bd = parents[:-1][same]
        db = distinct_per_doc(bd, bg)
    else:
        db = np.zeros(n, dtype=np.int64)
    return dt, db


def repetition_stage(cfg: EngineConfig, id_col: str, text_col: str):
    """Gopher-style intra-document repetition signals (the public rule
    family of Rae et al. 2021, table A1): fraction of duplicated tokens
    and duplicated word-bigrams per document, over the same lowered
    non-empty token stream as ``quality_stage`` (stopwords KEPT —
    repetition measures raw text structure).

    dup_x_ratio = 1 - distinct/total (0.0 for docs with no tokens /
    no bigrams), round(6) for oracle parity.  Token identity is EXACT:
    Arrow dictionary-encode gives per-batch integer codes with no hash
    collisions, so the DuckDB string-distinct oracle matches
    bit-for-bit.  Fully vectorized (one lexsort per signal)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        lists = _token_lists(col, cfg)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        counts = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)

        dt, db = _distinct_token_bigram_counts(parents, flat, n)
        nb = np.maximum(counts - 1, 0)

        tok_ratio = np.where(counts > 0,
                             1.0 - dt / np.maximum(counts, 1), 0.0)
        big_ratio = np.where(nb > 0, 1.0 - db / np.maximum(nb, 1), 0.0)
        return pa.table({
            id_col: batch[id_col],
            "dup_token_ratio": pa.array(np.round(tok_ratio, 6)),
            "dup_bigram_ratio": pa.array(np.round(big_ratio, 6)),
        })
    return fn


# single source of truth for the six rule thresholds — the SQL oracle
# generator reads THIS dict, so engine and oracle can never drift
GOPHER_DEFAULTS: dict = {
    "min_tokens": 50, "max_tokens": 100_000,
    "min_mean_len": 3.0, "max_mean_len": 10.0,
    "min_stop_hits": 2, "min_alpha_ratio": 0.8,
    "max_dup_token_ratio": 0.6, "max_dup_bigram_ratio": 0.5,
}


def gopher_filter_stage(cfg: EngineConfig, id_col: str, text_col: str,
                        **rules):
    """Gopher-rules quality filter (Rae et al. 2021 table A1, the public
    rule family) as ONE fused pass: token count range, mean token length
    range, minimum stop-word hits, alphabetic-token ratio, and the two
    repetition caps — emitting (id, n_tokens_all, fail_mask, keep).

    fail_mask bit i set = rule i FAILED:
      0 token count outside [min_tokens, max_tokens]
      1 mean token length outside [min_mean_len, max_mean_len]
      2 fewer than min_stop_hits stop-word tokens
      3 alphabetic-token ratio below min_alpha_ratio
      4 dup-token ratio above max_dup_token_ratio
      5 dup-bigram ratio above max_dup_bigram_ratio

    EXACTNESS: every ratio is a single IEEE division of exact integers
    (no round() anywhere), so engine and DuckDB comparisons are
    bit-identical; the output is all-integer.  Thresholds default from
    ``GOPHER_DEFAULTS`` (shared with the oracle generator)."""
    unknown = sorted(set(rules) - set(GOPHER_DEFAULTS))
    if unknown:
        raise TypeError(f"unknown gopher rule(s) {unknown}; valid: "
                        f"{sorted(GOPHER_DEFAULTS)}")
    p = {**GOPHER_DEFAULTS, **rules}
    min_tokens, max_tokens = p["min_tokens"], p["max_tokens"]
    min_mean_len, max_mean_len = p["min_mean_len"], p["max_mean_len"]
    min_stop_hits = p["min_stop_hits"]
    min_alpha_ratio = p["min_alpha_ratio"]
    max_dup_token_ratio = p["max_dup_token_ratio"]
    max_dup_bigram_ratio = p["max_dup_bigram_ratio"]
    stop_set = pa.array(list(cfg.stopwords), type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = _token_lists(texts, cfg)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        nt = np.bincount(parents, minlength=n).astype(np.int64)
        safe = np.maximum(nt, 1).astype(np.float64)

        tok_len = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.float64)
        sum_len = np.bincount(parents, weights=tok_len, minlength=n)
        mean_len = sum_len / safe

        is_stop = pc.is_in(flat, value_set=stop_set).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(parents[is_stop], minlength=n).astype(np.int64)

        has_alpha = pc.match_substring_regex(flat, "[a-z]").to_numpy(
            zero_copy_only=False)
        n_alpha = np.bincount(parents[has_alpha],
                              minlength=n).astype(np.float64)
        alpha_ratio = n_alpha / safe

        # distinct tokens / bigrams per doc — the shared helper (ONE
        # copy of the exactness-critical method)
        dt_i, db_i = _distinct_token_bigram_counts(parents, flat, n)
        dt = dt_i.astype(np.float64)
        db = db_i.astype(np.float64)
        nb = np.maximum(nt - 1, 0)
        dup_tok = np.where(nt > 0, 1.0 - dt / safe, 0.0)
        dup_big = np.where(nb > 0,
                           1.0 - db / np.maximum(nb, 1).astype(np.float64),
                           0.0)

        mask = np.zeros(n, dtype=np.int64)
        mask |= ((nt < min_tokens) | (nt > max_tokens)) * 1
        mask |= ((mean_len < min_mean_len)
                 | (mean_len > max_mean_len)) * 2
        mask |= (n_stop < min_stop_hits) * 4
        mask |= (alpha_ratio < min_alpha_ratio) * 8
        mask |= (dup_tok > max_dup_token_ratio) * 16
        mask |= (dup_big > max_dup_bigram_ratio) * 32
        return pa.table({
            id_col: batch[id_col],
            "n_tokens_all": pa.array(nt),
            "fail_mask": pa.array(mask),
            "keep": pa.array((mask == 0).astype(np.int64)),
        })
    return fn


def normalized_text(batch_texts: pa.Array, cfg: EngineConfig) -> pa.Array:
    lists = _token_lists(batch_texts, cfg)
    return pc.binary_join(lists, " ")


# PII redaction: RE2 patterns shared verbatim with the DuckDB oracle
# (pyarrow and DuckDB both compile RE2, so match/replace semantics are
# engine-identical — verified for overlap/boundary cases in
# tests/test_round3.py).  Order matters (emails contain digits/dots that
# the later patterns could clip), so patterns apply SEQUENTIALLY and each
# count is taken on the text as it stood before that pattern's replace —
# the oracle mirrors with a chained CTE.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,3}[ \-]\d{3}[ \-]\d{3}[ \-]\d{4}", "[PHONE]"),
)


def pii_scrub_stage(id_col: str, text_col: str,
                    patterns=PII_PATTERNS):
    """(id, n_<kind>..., clean_text) — redact PII spans with typed
    placeholder tokens.  One vectorized RE2 pass per pattern per batch
    (no per-row Python); a first-class training-data-pipeline operator
    (not in the reference, which has no corpus-prep layer)."""
    def fn(batch: pa.Table) -> pa.Table:
        cur = batch[text_col]
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        cols: dict[str, pa.Array] = {id_col: batch[id_col]}
        for name, pat, repl in patterns:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(cur, pattern=pat), pa.int64())
            cur = pc.replace_substring_regex(cur, pattern=pat,
                                             replacement=repl)
        cols["clean_text"] = cur
        return pa.table(cols)
    return fn


def pii_filter(ds: "rd.Dataset", *, text_col: str = "text",
               max_pii: int = 0, patterns=PII_PATTERNS) -> "rd.Dataset":
    """Strict-curation sibling of ``pii_scrub_stage``: DROP documents
    with more than ``max_pii`` total PII hits (counts under the same
    sequential-pattern rule the scrubber and its oracle use) — original
    columns pass through untouched.  One streaming pass, no shuffle."""
    def _f(batch: pa.Table) -> pa.Table:
        cur = batch[text_col]
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        total = None
        for _, pat, repl in patterns:
            c = pc.cast(pc.count_substring_regex(cur, pattern=pat),
                        pa.int64())
            total = c if total is None else pc.add(total, c)
            cur = pc.replace_substring_regex(cur, pattern=pat,
                                             replacement=repl)
        # NULL text has zero PII hits and must be KEPT (count_substring
        # propagates null through the comparison and Table.filter would
        # silently DROP the row otherwise — pii_scrub_stage passes null
        # rows through, the filter must agree)
        total = pc.fill_null(total, 0)
        return batch.filter(pc.less_equal(total, max_pii))
    return ds.map_batches(_f, batch_format="pyarrow")


_KW_IDF_CACHE: dict = {}


def extract_keywords(ds: "rd.Dataset", index_dir: str,
                     cfg: EngineConfig, id_col: str, text_col: str, *,
                     k: int = 3) -> "rd.Dataset":
    """Per-document keyword extraction (the Lucene MLT term-selection
    rule applied corpus-wide — tf*idf tagging for training-data
    curation): each doc's top ``k`` post-stopword terms by tf * idf,
    ties term-ascending.  Returns (id, kw_rank, term, score).

    idf comes from the INDEX's global dictionary (df) + stats (N) —
    read once on the driver, broadcast via ``ray.put`` (vocab-sized;
    the decontaminate-style MB-scale broadcast assumption, prune by
    min_df at web vocab), and resolved per batch through a per-worker
    cache.  Terms absent from the dictionary score with df=0 idf (the
    transfer rule; impossible when ds IS the indexed corpus).  score =
    int tf x the shared ln idf — ONE multiply, bit-equal to the
    oracle (the mlt_sql precedent)."""
    import ray

    from opensearch_jvector_ray.functions.scoring import bm25_idf
    from opensearch_jvector_ray.state.manifest import STATS_NAME, read_json
    if k < 1:
        raise ValueError("k must be >= 1")
    import os
    import pandas as pd
    import pyarrow.parquet as pq
    stats = read_json(os.path.join(index_dir, STATS_NAME))
    n = float(stats["n_docs_indexed"])
    from opensearch_jvector_ray.state.manifest import (
        dict_read_paths, resolve_dict_dir)
    dtab = pq.read_table(dict_read_paths(resolve_dict_dir(index_dir)),
                         columns=["term", "df"])
    idf = pd.Series(
        bm25_idf(n, dtab["df"].to_numpy(zero_copy_only=False)
                 .astype(np.float64)),
        index=dtab["term"].to_pylist(), dtype=np.float64)
    ref = ray.put((idf, float(bm25_idf(n, 0.0))))

    def fn(batch: pa.Table) -> pa.Table:
        key = ref.hex() if hasattr(ref, "hex") else id(ref)
        hit = _KW_IDF_CACHE.get(key)
        if hit is None:
            hit = ray.get(ref)
            _KW_IDF_CACHE.clear()      # one live idf table per worker
            _KW_IDF_CACHE[key] = hit
        idf_s, oov = hit
        stream = tokenize(batch[text_col], cfg)
        g = (pd.DataFrame({"__d": stream.doc_idx,
                           "term": stream.terms.to_pandas()})
             .groupby(["__d", "term"], sort=False)
             .size().rename("tf").reset_index())
        if not len(g):
            return pa.table({
                id_col: batch[id_col].slice(0, 0),
                "kw_rank": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "score": pa.array([], type=pa.float64()),
            })
        tidf = g["term"].map(idf_s).fillna(oov).to_numpy(np.float64)
        # rank on the ROUND-6 score with term-asc ties (the repo's
        # vector-entry rule): numpy log vs libm ln last-ulp drift makes
        # a raw rank probabilistic at the k boundary; the rounded rank
        # is exact whenever the rounded values agree
        g["score"] = np.round(
            g["tf"].to_numpy(np.int64).astype(np.float64) * tidf, 6)
        g = g.sort_values(["__d", "score", "term"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("__d", sort=False).head(k)
        g["kw_rank"] = g.groupby("__d", sort=False).cumcount() + 1
        take = pa.array(g["__d"].to_numpy(np.int64))
        return pa.table({
            id_col: batch[id_col].take(take),
            "kw_rank": pa.array(g["kw_rank"].to_numpy(np.int64),
                                type=pa.int64()),
            "term": pa.array(g["term"].to_numpy(object), type=pa.string()),
            "score": pa.array(g["score"].to_numpy(np.float64),
                              type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
