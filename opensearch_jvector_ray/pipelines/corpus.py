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


# ---------------------------------------------------------------------------
# deterministic sampling / split assignment (dataset-mixing machinery)
# ---------------------------------------------------------------------------

def sample_threshold_hex(rate: float) -> str:
    """4-hex-digit threshold for a keep-rate in (0, 1): a row is kept iff
    the first 4 hex digits of its md5 sort LEXICALLY below this (fixed-
    width lowercase hex, so lexical == numeric — no int parsing on either
    side).  Resolution 1/65536; shared by the engine AND the SQL oracle
    generator so the rule can never drift."""
    return format(max(0, min(65535, int(round(rate * 65536)))), "04x")


def _md5_prefix(ids: np.ndarray, salt: str) -> np.ndarray:
    # per-row md5 kept deliberately for DuckDB parity (the exact_dedup
    # rule): md5(salt || id::VARCHAR), first 4 hex chars
    return np.array([hashlib.md5((salt + str(int(i))).encode())
                     .hexdigest()[:4] for i in ids])


def hash_sample(ds: "rd.Dataset", id_col: str, rate: float, *,
                salt: str = "") -> "rd.Dataset":
    """Deterministic Bernoulli sample: keep a row iff
    md5(salt || id)[:4] < threshold(rate).

    The reproducible-sampling primitive a 100-TB mixing pipeline needs:
    membership depends only on (id, salt) — stable across reruns,
    resumable shards, and machines (no RNG state, no global pass);
    changing ``salt`` draws an independent sample (epoch reseeding).
    Runs as a stateless filter inside map_batches — no shuffle, no
    materialization, composes with any downstream stage."""
    if rate >= 1.0:
        return ds
    thresh = sample_threshold_hex(rate)

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or rate <= 0.0:
            return batch.slice(0, 0)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_md5_prefix(ids, salt) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds: "rd.Dataset", id_col: str,
               splits: dict[str, float], *, salt: str = "",
               out_col: str = "split") -> "rd.Dataset":
    """Assign every row a deterministic split label by md5 hash range.

    ``splits`` maps label -> fraction (must sum to <= 1; any remainder
    falls into the LAST label, so {"train": .9, "val": .1} is exact).
    Labels are laid out over [0, ffff] in SORTED-label order — the same
    CASE ladder the SQL oracle emits — and assignment depends only on
    (id, salt): a row keeps its split across reruns and cluster sizes,
    which is what makes train/val leakage impossible at scale."""
    labels = sorted(splits)
    edges, acc = [], 0.0
    for lab in labels:
        acc += float(splits[lab])
        # a cumulative fraction of 1.0 claims EVERYTHING left (edge
        # None): sample_threshold_hex clamps to 'ffff', and the strict
        # `pref < 'ffff'` would leak the ~1/65536 of rows whose hash
        # prefix IS 'ffff' past a 100%-covering non-last label (the
        # rate>=1.0 full-keep rule hash_sample/mix_sources already
        # have; the oracle emits WHEN TRUE for the same arm)
        edges.append(None if acc >= 1.0
                     else sample_threshold_hex(acc))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col,
                                       pa.array([], type=pa.string()))
        pref = _md5_prefix(batch[id_col].to_numpy(zero_copy_only=False),
                           salt)
        # edges are monotonic, so claiming in ascending order gives each
        # label exactly its [prev_edge, edge) hash range — the same
        # first-match rule as the oracle's CASE ladder
        out = np.full(len(pref), labels[-1], dtype=object)
        claimed = np.zeros(len(pref), dtype=bool)
        for lab, edge in zip(labels[:-1], edges[:-1]):
            take = ~claimed if edge is None else (~claimed
                                                  & (pref < edge))
            out[take] = lab
            claimed |= take
        return batch.append_column(out_col, pa.array(out, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def mix_sources(ds: "rd.Dataset", id_col: str, source_col: str,
                rates: dict[str, float], *, salt: str = "",
                default_rate: float = 0.0) -> "rd.Dataset":
    """Dataset mixing: per-source deterministic Bernoulli sampling to a
    target mixture (the Pile / CCNet mixture-weights step — each corpus
    source is up/down-sampled to its configured proportion).

    Keep a row iff md5(salt || id)[:4] < threshold(rates[source])
    (sources at rate >= 1.0 keep everything; sources missing from
    ``rates`` use ``default_rate``).  Membership depends only on
    (id, salt) — stable across reruns, shards and cluster sizes, and the
    per-source thresholds compose with ``hash_split``'s disjoint ranges.
    Stateless map_batches filter: no shuffle, no materialization."""
    full = {s for s, r in rates.items() if r >= 1.0}
    thresh = {s: sample_threshold_hex(r) for s, r in rates.items()
              if r < 1.0}
    default_full = default_rate >= 1.0
    default_hex = sample_threshold_hex(min(default_rate, 1.0))

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        src = batch[source_col].to_numpy(zero_copy_only=False)
        pref = _md5_prefix(ids, salt)
        th = np.asarray(
            [thresh.get(s, default_hex) for s in src], dtype="U4")
        is_full = np.asarray(
            [s in full or (default_full and s not in thresh)
             for s in src], dtype=bool)
        return batch.filter(pa.array(is_full | (pref < th)))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk at a token budget)
# ---------------------------------------------------------------------------

def pack_chunks(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                text_col: str, *, budget: int = 1024) -> "rd.Dataset":
    """GPT-style sequence packing: docs in id order are laid head-to-tail
    on one global token tape and chunked every ``budget`` tokens —
    returns (id, n_tokens, pack_id, pack_offset) where ``pack_id`` =
    global-token-offset // budget and ``pack_offset`` the position of the
    doc's first token inside its pack (docs may straddle packs, the
    concat-then-chunk pretraining rule).

    The distributed PREFIX-SCAN shape: tokenize+count per batch (text
    never shuffles), one narrow (id, n_tokens) sort, per-block token
    sums reduced to a num_blocks-sized vector the driver prefix-sums
    (bounded by block count, not rows), then per-block tasks assign
    global offsets — two passes over a two-column dataset, no
    materialization on the driver."""
    import ray

    from opensearch_jvector_ray.pipelines.textstats import token_count_stage
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    counts = (ds.map_batches(token_count_stage(cfg, id_col, text_col),
                             batch_format="pyarrow")
                .sort(id_col))
    refs = counts.to_arrow_refs()

    @ray.remote
    def _block_sum(tbl: pa.Table) -> int:
        return int(np.sum(tbl["n_tokens"].to_numpy(zero_copy_only=False)))

    sums = np.asarray(ray.get([_block_sum.remote(r) for r in refs]),
                      dtype=np.int64)
    offs = np.zeros(len(sums), dtype=np.int64)
    if len(sums) > 1:
        np.cumsum(sums[:-1], out=offs[1:])

    @ray.remote
    def _assign(tbl: pa.Table, base: int) -> pa.Table:
        n = tbl["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = np.zeros(len(n), dtype=np.int64)
        if len(n) > 1:
            np.cumsum(n[:-1], out=start[1:])
        start += base
        return (tbl.append_column("pack_id", pa.array(start // budget))
                   .append_column("pack_offset", pa.array(start % budget)))

    out_refs = [_assign.remote(r, int(o)) for r, o in zip(refs, offs)]
    return rd.from_arrow_refs(out_refs)


def chunk_documents(ds: "rd.Dataset", id_col: str, text_col: str, *,
                    chunk_tokens: int = 512,
                    overlap: int = 64) -> "rd.Dataset":
    """Overlapping document chunking (the RAG / context-window prep
    step): each doc's whitespace tokens are windowed into chunks of
    ``chunk_tokens`` with ``overlap`` tokens of context carried between
    consecutive chunks (stride = chunk_tokens - overlap); the LAST
    chunk is the tail remainder (may be shorter).  Empty docs emit no
    chunk.  Returns (id, chunk_idx, n_tokens, chunk_text).

    Chunk-count rule (shared verbatim with the oracle's integer math):
    n_chunks = 1 if n <= chunk_tokens else
               1 + (n - chunk_tokens + stride - 1) // stride.

    Pure per-batch flat-map — text never shuffles; the expansion is one
    ragged token gather (offsets math) + one binary_join per batch, no
    per-doc Python loop.  Tokens are the RE2 ``\\s+`` split shared with
    DuckDB's regexp_split_to_array, so chunk text is byte-identical."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(texts, pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        n_docs = len(texts)
        n_tok = np.bincount(parents, minlength=n_docs).astype(np.int64)
        tok_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_tok, out=tok_off[1:])
        # chunk counts per doc (0 for empty docs)
        n_chunks = np.where(
            n_tok == 0, 0,
            np.where(n_tok <= chunk_tokens, 1,
                     1 + (n_tok - chunk_tokens + stride - 1) // stride))
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                id_col: batch[id_col].slice(0, 0),
                "chunk_idx": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
            })
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
        coff = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=coff[1:])
        chunk_idx = np.arange(total, dtype=np.int64) - coff[doc_of]
        start = chunk_idx * stride
        end = np.minimum(start + chunk_tokens, n_tok[doc_of])
        lens = end - start
        # ragged gather of token indices: one arange + offset scatter
        out_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(lens, out=out_off[1:])
        flat_n = int(out_off[-1])
        gather = np.arange(flat_n, dtype=np.int64)
        gather -= np.repeat(out_off[:-1], lens)          # 0..len-1 per chunk
        gather += np.repeat(tok_off[doc_of] + start, lens)
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(out_off, type=pa.int32()) if flat_n < 2**31
            else pa.array(out_off),
            flat.take(pa.array(gather)))
        return pa.table({
            id_col: batch[id_col].take(pa.array(doc_of)),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            "n_tokens": pa.array(lens, type=pa.int64()),
            "chunk_text": pc.binary_join(chunk_lists, " "),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def bpe_merge_candidates(ds: "rd.Dataset", text_col: str = "text", *,
                         top_k: int = 30,
                         pattern: str | None = None) -> "pd.DataFrame":
    """BPE tokenizer-training step [Sennrich et al. 2016 public
    algorithm, the GPT-2 byte-level variant's first iteration]: count
    adjacent CHARACTER pairs inside every pre-token across the corpus
    and return the ``top_k`` merge candidates by count — the pair the
    first BPE merge would fuse, plus the ranked tail.

    Pre-tokens come from the shared ``textstats.BPE_PATTERN`` (RE2-safe,
    the string DuckDB's ``regexp_extract_all`` consumes verbatim), so
    pair counting never crosses a pre-token boundary.  Per batch: ONE
    findall over the newline-joined batch text (the pattern's classes
    all exclude whitespace, so the join separator can neither create
    nor merge matches), codepoint arrays via utf-32 views, boundary-
    masked pair keys (c1 * 2^21 + c2 — codepoints < 2^21), and a
    np.unique partial.  Partials are distinct-pair-sized (combiner-
    first); ONE tiny groupby merges them and the driver decodes or
    ranks only distinct-pair rows.  Ties rank (count DESC, pair ASC) —
    DuckDB's binary collation == codepoint order."""
    import re as _re

    import pandas as pd

    from ray.data.aggregate import Sum

    from opensearch_jvector_ray.pipelines.textstats import BPE_PATTERN
    pat = _re.compile(pattern if pattern is not None else BPE_PATTERN)
    if top_k < 1:
        raise ValueError("top_k must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.drop_null()        # NULL text has no pre-tokens
        toks = pat.findall("\n".join(texts.to_pylist()))
        empty = pa.table({"pair_key": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        if not toks:
            return empty
        joined = "".join(toks)
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32) \
            .astype(np.int64)
        if len(cp) < 2:
            return empty
        ends = np.cumsum(np.fromiter(map(len, toks), dtype=np.int64,
                                     count=len(toks)))
        # pair i spans cp[i], cp[i+1]; cross-token pairs (i = a token's
        # last char) are masked — the final token's end has no pair row
        valid = np.ones(len(cp) - 1, dtype=bool)
        cut = ends[:-1] - 1
        valid[cut[cut < len(valid)]] = False
        keys = cp[:-1][valid] * 0x200000 + cp[1:][valid]
        uk, uc = np.unique(keys, return_counts=True)
        return pa.table({"pair_key": pa.array(uk, type=pa.int64()),
                         "cnt": pa.array(uc.astype(np.int64),
                                         type=pa.int64())})

    merged = (ds.select_columns([text_col])
                .map_batches(partial, batch_format="pyarrow")
                .groupby("pair_key")
                .aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas())
    if merged.empty:
        return pd.DataFrame({"pair": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    k1 = (merged["pair_key"].to_numpy() // 0x200000).astype(np.uint32)
    k2 = (merged["pair_key"].to_numpy() % 0x200000).astype(np.uint32)
    flat = np.stack([k1, k2], axis=1).tobytes()
    s = flat.decode("utf-32-le")
    merged["pair"] = [s[2 * i: 2 * i + 2] for i in range(len(merged))]
    merged["cnt"] = merged["cnt"].astype(np.int64)
    out = merged.sort_values(["cnt", "pair"],
                             ascending=[False, True], kind="mergesort")
    return out[["pair", "cnt"]].head(top_k).reset_index(drop=True)


def pretoken_counts(ds: "rd.Dataset", text_col: str = "text", *,
                    pattern: str | None = None) -> "pd.DataFrame":
    """Distinct pre-token frequency table (the BPE training corpus form
    [Sennrich et al. 2016]: BPE never merges across pre-token
    boundaries, so the corpus collapses to a word-frequency dict).
    Per batch: ONE findall + np.unique partial (distinct-token-sized);
    ONE groupby merges the partials.  Returns (token, cnt)."""
    import re as _re

    import pandas as pd

    from ray.data.aggregate import Sum

    from opensearch_jvector_ray.pipelines.textstats import BPE_PATTERN
    pat = _re.compile(pattern if pattern is not None else BPE_PATTERN)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.drop_null()        # NULL text has no pre-tokens
        toks = pat.findall("\n".join(texts.to_pylist()))
        if not toks:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        uk, uc = np.unique(np.asarray(toks, dtype=object),
                           return_counts=True)
        return pa.table({"token": pa.array(uk.tolist(),
                                           type=pa.string()),
                         "cnt": pa.array(uc.astype(np.int64),
                                         type=pa.int64())})

    out = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("token")
             .aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def bpe_train(ds: "rd.Dataset", num_merges: int,
              text_col: str = "text", *,
              pattern: str | None = None,
              min_count: int = 1,
              max_words: int | None = None) -> "pd.DataFrame":
    """Full BPE tokenizer training [Sennrich et al. 2016, the public
    word-frequency-dict algorithm]: ONE distributed pass builds the
    pre-token frequency table (``pretoken_counts``), then the merge
    loop runs driver-side over that DICT — per iteration it counts
    symbol pairs weighted by word frequency, fuses the (count DESC,
    pair ASC) winner in every word, and records the merge.  The loop
    is vocab-sized, never corpus-sized: this is how BPE trainers scale
    in practice (the corpus collapses to distinct words x counts; cap
    the dict with ``min_count`` / ``max_words`` on web-scale vocab —
    both caps are applied on (cnt DESC, token ASC) order so the
    truncation is deterministic).

    Returns (merge_idx, left, right, cnt): the i-th merge fused symbol
    ``left`` + ``right`` (strings over the original alphabet) with
    corpus-weighted pair count ``cnt``.  Iteration 0's winner equals
    ``bpe_merge_candidates``' top pair by construction (same pattern,
    same tie rule) — pytest pins that identity."""
    import pandas as pd

    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    wf = pretoken_counts(ds, text_col, pattern=pattern)
    wf = wf[wf["cnt"] >= min_count]
    wf = wf.sort_values(["cnt", "token"], ascending=[False, True],
                        kind="mergesort")
    if max_words is not None:
        wf = wf.head(max_words)
    words = [list(t) for t in wf["token"]]
    freqs = wf["cnt"].to_numpy(np.int64)
    merges = []
    for mi in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in zip(words, freqs):
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + int(f)
        if not counts:
            break
        (la, rb), cnt = min(counts.items(),
                            key=lambda kv: (-kv[1], kv[0]))
        merges.append((mi, la, rb, cnt))
        fused = la + rb
        for i, w in enumerate(words):
            if len(w) < 2:
                continue
            j, out = 0, []
            while j < len(w):
                if j + 1 < len(w) and w[j] == la and w[j + 1] == rb:
                    out.append(fused)
                    j += 2
                else:
                    out.append(w[j])
                    j += 1
            words[i] = out
    return pd.DataFrame(merges, columns=["merge_idx", "left", "right",
                                         "cnt"]).astype(
        {"merge_idx": np.int64, "cnt": np.int64})


def bpe_encode(ds: "rd.Dataset", merges, id_col: str = "doc_id",
               text_col: str = "text", *,
               pattern: str | None = None) -> "rd.Dataset":
    """Apply a trained BPE merge list (``bpe_train``'s output order) to
    a corpus and return per-doc encoded-token counts — the budget
    metric a data pipeline slices on after fitting a tokenizer
    [Sennrich et al. 2016 apply step; GPT-2 rank-greedy application:
    repeatedly fuse the LOWEST-RANK adjacent pair].

    Per batch: pre-tokens via ONE findall, np.unique collapses to
    DISTINCT tokens, each distinct token is encoded ONCE (the merge
    loop is bounded by distinct-token count x token length, never
    corpus size), and counts map back to docs with one searchsorted
    gather.  The merge table broadcasts once per task (fn_kwargs).
    Output: (id_col, n_bpe_tokens int64)."""
    import re as _re

    from opensearch_jvector_ray.pipelines.textstats import BPE_PATTERN
    if hasattr(merges, "itertuples"):      # bpe_train DataFrame
        ranks = {(r.left, r.right): i
                 for i, r in enumerate(merges.itertuples(index=False))}
    else:
        ranks = {(la, rb): i for i, (la, rb) in enumerate(merges)}
    pat_s = pattern if pattern is not None else BPE_PATTERN

    def encode_len(tok: str) -> int:
        word = list(tok)
        while len(word) > 1:
            best, bi = None, -1
            for i, pair in enumerate(zip(word, word[1:])):
                r = ranks.get(pair)
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            word[bi:bi + 2] = [word[bi] + word[bi + 1]]
        return len(word)

    def apply(batch: pa.Table) -> pa.Table:
        pat = _re.compile(pat_s)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        vals = texts.to_pylist()
        per_doc = np.zeros(batch.num_rows, dtype=np.int64)
        all_toks: list[str] = []
        doc_of: list[int] = []
        for i, t in enumerate(vals):
            if t is None:
                continue
            toks = pat.findall(t)
            all_toks.extend(toks)
            doc_of.extend([i] * len(toks))
        if all_toks:
            arr = np.asarray(all_toks, dtype=object)
            uniq, inv = np.unique(arr, return_inverse=True)
            lens = np.fromiter((encode_len(u) for u in uniq),
                               dtype=np.int64, count=len(uniq))
            np.add.at(per_doc, np.asarray(doc_of), lens[inv])
        return pa.table({id_col: batch[id_col],
                         "n_bpe_tokens": pa.array(per_doc)})

    return (ds.select_columns([id_col, text_col])
              .map_batches(apply, batch_format="pyarrow"))
