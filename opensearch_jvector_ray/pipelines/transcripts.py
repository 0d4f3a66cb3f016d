"""Conversation-level operators over the `input_hint` transcripts table
(conv_id, turn_idx, role, text, tool, ts) — the document-assembly and
unit-dedup steps an LLM training pipeline runs between raw transcript
turns and the tokenizer:

  - ``assemble_conversations``: turns -> one training document per
    conversation ("role: text" lines joined in turn order).  ONE shuffle
    keyed on conv_id (``hash_copartition``), whole-bucket vectorized
    assembly (lexsort + Arrow ``binary_join`` over a ListArray — no
    per-conversation Python).
  - ``turn_dedup``: turn-level exact dedup — the paragraph-dedup analog
    at transcript granularity.  Every turn is hashed on its
    analyzer-normalized text (the ``exact_dedup`` canon rule); the first
    occurrence by document key keeps, later copies are flagged.  ONE
    shuffle keyed on text_hash; rows carry (doc_id, hash) only, never
    text.

Both have symbol-exact DuckDB oracles (``oracles.conversation_sql`` /
``oracles.turn_dedup_sql``) built on the multi-scale transcript-arm CTE,
so both are HARD driver gates.  Doc key is the zero-padded composite
``conv_id:turn_idx`` whose lexicographic order equals (conv_id, turn_idx)
order — the engine-wide transcript tie rule.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines.relational import hash_copartition
from opensearch_jvector_ray.pipelines.textstats import normalized_text

from opensearch_jvector_ray.synth import PLANT_EVERY  # shared stride

SEP = "\n"


def _doc_key(conv: pa.Array, turn_idx: pa.Array) -> pa.Array:
    # pad width 10 covers the full int32 range: the lexicographic-==-
    # numeric invariant used to break at turn_idx >= 10000 (the 4-wide
    # pad left '10000' longer than '9999' but smaller lexically);
    # width is mirrored by every oracle lpad
    padded = pc.utf8_lpad(pc.cast(turn_idx, pa.string()), 10, "0")
    return pc.binary_join_element_wise(conv, padded, ":")


def assemble_conversations(ds: "rd.Dataset",
                           num_parts: int = 64) -> "rd.Dataset":
    """(conv_id, n_turns, conv_text) — one row per conversation.

    The "role: text" line concat happens in the parallel PRE-shuffle
    stage (Arrow kernel), so the exchange carries (conv_id, turn_idx,
    line) only and the per-bucket work is pure lexsort + ListArray
    ``binary_join``."""
    def prep(batch: pa.Table) -> pa.Table:
        role = batch["role"]
        if isinstance(role, pa.ChunkedArray):
            role = role.combine_chunks()
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "line": pc.binary_join_element_wise(role, text, ": "),
        })

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        conv = df["conv_id"].to_numpy()
        order = np.lexsort((df["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        lines = pa.array(df["line"].to_numpy()[order], type=pa.string())
        new = np.ones(len(conv), dtype=bool)
        new[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(new)
        offsets = np.append(starts, len(conv)).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), lines), SEP)
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_turns": np.diff(offsets).astype(np.int64),
            "conv_text": joined.to_pandas(),
        })

    prepped = ds.select_columns(["conv_id", "turn_idx", "role", "text"]) \
                .map_batches(prep, batch_format="pyarrow")
    return hash_copartition(prepped, "conv_id", bucket, num_parts)


def context_response_pairs(ds: "rd.Dataset",
                           max_context_turns: int = 4,
                           num_parts: int = 64) -> "rd.Dataset":
    """SFT training-pair extraction over the input_hint transcript
    shape: one (conv_id, turn_idx, context, response) row per ASSISTANT
    turn with >= 1 preceding turn — ``context`` = the "role: text"
    lines of the preceding min(max_context_turns, position) turns in
    turn order joined by \\n, ``response`` = the assistant turn's text.
    The window is POSITIONAL (preceding turns by turn order), not
    turn_idx arithmetic, so gaps in turn_idx don't shrink it.

    ONE shuffle keyed on conv_id (``hash_copartition``); per-bucket
    work is a lexsort + ragged window gather + ListArray
    ``binary_join`` — no per-conversation Python.  Oracle:
    ``oracles.context_pairs_sql`` (windowed string_agg with a ROWS
    BETWEEN K PRECEDING AND 1 PRECEDING frame — DuckDB aggregates the
    frame in ascending order, the engine's turn order)."""
    K = int(max_context_turns)
    if K < 1:
        raise ValueError("max_context_turns must be >= 1")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        conv = df["conv_id"].to_numpy()
        order = np.lexsort((df["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        turn = df["turn_idx"].to_numpy()[order]
        role = df["role"].to_numpy()[order]
        text = df["text"].to_numpy()[order]
        # "role: text" lines built IN-bucket so the shuffle carries the
        # text bytes once (not text + pre-joined line)
        lines = pc.binary_join_element_wise(
            pa.array(role, type=pa.string()),
            pa.array(text, type=pa.string()), ": ")
        n = len(conv)
        new = np.ones(n, dtype=bool)
        new[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(new)
        conv_start = np.repeat(starts,
                               np.diff(np.append(starts, n)))
        idx = np.arange(n, dtype=np.int64)
        sel = np.flatnonzero((role == "assistant") & (idx > conv_start))
        if not len(sel):
            # TYPED empty frame: object-dtype empties convert to Arrow
            # null-typed columns and rely on schema promotion to unify
            # with other buckets' string/int64 blocks (the events_funnel
            # hazard note)
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int64),
                "context": pd.Series([], dtype=object),
                "response": pd.Series([], dtype=object)})
        lo = np.maximum(conv_start[sel], sel - K)
        lens = sel - lo
        total = int(lens.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens,
                                              lens)
        flat_idx = np.repeat(lo, lens) + within
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        ctx = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets),
                                     lines.take(pa.array(flat_idx))),
            SEP)
        return pd.DataFrame({
            "conv_id": conv[sel],
            "turn_idx": turn[sel].astype(np.int64),
            "context": ctx.to_pandas(),
            "response": text[sel],
        })

    prepped = ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    return hash_copartition(prepped, "conv_id", bucket, num_parts)


def response_novelty(ds: "rd.Dataset", cfg: EngineConfig,
                     max_context_turns: int = 4,
                     num_parts: int = 64) -> "rd.Dataset":
    """SFT pair-quality signal over the input_hint transcript shape:
    for every assistant turn with >= 1 preceding turn (the
    ``context_response_pairs`` selection rule), the fraction of its
    DISTINCT analyzed response tokens that do NOT appear in the
    preceding min(K, position) turns' token sets — low novelty flags
    parrot/echo responses, high novelty flags context-free ones (a
    standard SFT-pair filter signal).

    Tokens are the engine analyzer's post-stopword (and, if configured,
    stemmed) terms — the rule the generated oracle shares via the
    toks_cte expression.  ONE conv_id shuffle; per-bucket work is one
    vectorized analyze of the bucket's turn texts, integer token codes
    (np.unique), a ragged window gather for the context sets, and a
    composite-key searchsorted membership test — no per-pair Python.
    ``novelty`` = novel_distinct / resp_distinct: two exact integers,
    ONE division (bit-equal to the oracle's).  Responses with zero
    analyzed tokens emit no row (novelty undefined — the oracle's
    len(toks) > 0)."""
    from opensearch_jvector_ray.analyze import tokenize
    K = int(max_context_turns)
    if K < 1:
        raise ValueError("max_context_turns must be >= 1")

    def _ragged_arange(lens: np.ndarray) -> np.ndarray:
        total = int(lens.sum())
        return (np.arange(total)
                - np.repeat(np.cumsum(lens) - lens, lens))

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "conv_id": pd.Series([], dtype=object),
            "turn_idx": pd.Series([], dtype=np.int64),
            "resp_distinct": pd.Series([], dtype=np.int64),
            "novel_distinct": pd.Series([], dtype=np.int64),
            "novelty": pd.Series([], dtype=np.float64)})
        conv = df["conv_id"].to_numpy()
        order = np.lexsort((df["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        turn = df["turn_idx"].to_numpy()[order]
        role = df["role"].to_numpy()[order]
        stream = tokenize(pa.array(df["text"].to_numpy()[order],
                                   type=pa.string()), cfg)
        terms = stream.terms.to_numpy(zero_copy_only=False)
        n = len(conv)
        if not len(terms):
            return empty
        uniq, codes = np.unique(terms, return_inverse=True)
        C = len(uniq)
        # per-turn DISTINCT (turn, code) pairs, turn-major
        ukey = np.unique(stream.doc_idx.astype(np.int64) * C + codes)
        udoc = ukey // C
        ucode = ukey % C
        per_turn = np.bincount(udoc, minlength=n)
        u_offs = np.concatenate(([0], np.cumsum(per_turn)))
        # pair selection: assistant turns past the conversation start
        # with >= 1 analyzed response token
        new = np.ones(n, dtype=bool)
        new[1:] = conv[1:] != conv[:-1]
        cstarts = np.flatnonzero(new)
        conv_start = np.repeat(cstarts, np.diff(np.append(cstarts, n)))
        idx = np.arange(n, dtype=np.int64)
        sel = np.flatnonzero((role == "assistant") & (idx > conv_start)
                             & (per_turn > 0))
        if not len(sel):
            return empty
        # context token sets: ragged window turn gather, then each
        # window turn's distinct-code slice
        lo = np.maximum(conv_start[sel], sel - K)
        wlens = sel - lo
        wturn = np.repeat(lo, wlens) + _ragged_arange(wlens)
        pair_of_wturn = np.repeat(np.arange(len(sel)), wlens)
        ccnt = per_turn[wturn]
        pair_of_ctx = np.repeat(pair_of_wturn, ccnt)
        flat_ctx = np.repeat(u_offs[wturn], ccnt) + _ragged_arange(ccnt)
        ctx_key = np.unique(pair_of_ctx * C + ucode[flat_ctx])
        # response distinct codes per pair + membership test
        rcnt = per_turn[sel]
        pair_of_resp = np.repeat(np.arange(len(sel)), rcnt)
        flat_resp = np.repeat(u_offs[sel], rcnt) + _ragged_arange(rcnt)
        resp_key = pair_of_resp * C + ucode[flat_resp]
        pos = np.searchsorted(ctx_key, resp_key)
        found = np.zeros(len(resp_key), dtype=bool)
        if len(ctx_key):
            inb = pos < len(ctx_key)
            found[inb] = ctx_key[pos[inb]] == resp_key[inb]
        novel = np.bincount(pair_of_resp, weights=~found,
                            minlength=len(sel)).astype(np.int64)
        return pd.DataFrame({
            "conv_id": conv[sel],
            "turn_idx": turn[sel].astype(np.int64),
            "resp_distinct": rcnt.astype(np.int64),
            "novel_distinct": novel,
            "novelty": novel.astype(np.float64)
                       / rcnt.astype(np.float64),
        })

    prepped = ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    return hash_copartition(prepped, "conv_id", bucket, num_parts)


def validate_conversations(ds: "rd.Dataset",
                           num_parts: int = 64) -> "rd.Dataset":
    """Conversation well-formedness validation (the filter an LLM
    training pipeline runs before assembly): one row per conversation
    with (n_turns, starts_user, has_assistant, no_role_repeat, valid) —
    valid = first turn is 'user' AND >= 1 'assistant' turn AND no two
    consecutive turns share a role (tool interleaves break alternation,
    which is why the naive user/assistant zig-zag rule is wrong here).
    ONE conv_id shuffle; per-bucket work is a lexsort + three reduceat
    segment reductions.  Oracle: ``oracles.validate_conversations_sql``
    (lag window + bool_or — NULL prev_role on the first row is ignored
    by bool_or on both sides)."""
    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        conv = df["conv_id"].to_numpy()
        order = np.lexsort((df["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        role = df["role"].to_numpy()[order]
        n = len(conv)
        new = np.ones(n, dtype=bool)
        new[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(new)
        n_turns = np.diff(np.append(starts, n)).astype(np.int64)
        starts_user = role[starts] == "user"
        has_asst = np.logical_or.reduceat(role == "assistant", starts)
        rep = np.zeros(n, dtype=bool)
        rep[1:] = (role[1:] == role[:-1]) & ~new[1:]
        no_repeat = ~np.logical_or.reduceat(rep, starts)
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_turns": n_turns,
            "starts_user": starts_user,
            "has_assistant": has_asst,
            "no_role_repeat": no_repeat,
            "valid": starts_user & has_asst & no_repeat,
        })

    prepped = ds.select_columns(["conv_id", "turn_idx", "role"])
    return hash_copartition(prepped, "conv_id", bucket, num_parts)


def plant_duplicate_turns(ds: "rd.Dataset",
                          plant_every: int = PLANT_EVERY) -> "rd.Dataset":
    """Deterministic duplicate planting (the embedding_near_dups trick):
    copy turn 1 of every ``plant_every``-th conversation under a
    ``dupe-``-prefixed conv_id.  'conv-' < 'dupe-' lexicographically, so
    originals stay canonical.  Gives the dedup gate guaranteed positives
    at every scale (the synth corpus has no natural turn-text dups)."""
    def plant(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        tail = pc.utf8_slice_codeunits(conv, 5)  # past 'conv-'
        cid = pc.cast(tail, pa.int64()).to_numpy(zero_copy_only=False)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
        mask = (cid % plant_every == 0) & (turn == 1)
        kept = batch.filter(pa.array(mask))
        new_conv = pc.binary_join_element_wise(
            pa.array(["dupe-"] * kept.num_rows, type=pa.string()),
            pc.utf8_slice_codeunits(
                kept["conv_id"].combine_chunks()
                if isinstance(kept["conv_id"], pa.ChunkedArray)
                else kept["conv_id"], 5), "")
        return kept.set_column(kept.column_names.index("conv_id"),
                               "conv_id", new_conv)

    return ds.union(ds.map_batches(plant, batch_format="pyarrow"))


def tool_usage_stats(ds: "rd.Dataset") -> pd.DataFrame:
    """Per-tool usage over the transcript corpus: call count, distinct
    conversations, mean turn position, first/last call timestamp —
    exercising the input_hint ``tool``/``ts`` columns.

    Combiner-first: each batch collapses to unique (tool, conv_id)
    partials, ONE groupby merges them (pair-sized rows, never turns),
    and the per-tool finish runs over tool-cardinality rows.  mean is a
    single integer division (bit-exact vs the SQL oracle)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["tool", "conv_id", "turn_idx", "ts"]).to_pandas()
        df = df[df["tool"] != ""]
        # normalize to us first: int64 view of datetime64 is unit-relative
        # (ns-resolution input would otherwise come back as year-55969)
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
        g = (df.groupby(["tool", "conv_id"], sort=False)
               .agg(n_calls=("turn_idx", "size"),
                    sum_turn=("turn_idx", "sum"),
                    first_us=("ts_us", "min"), last_us=("ts_us", "max"))
               .reset_index())
        g["n_calls"] = g["n_calls"].astype(np.int64)
        g["sum_turn"] = g["sum_turn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["tool", "conv_id"])
               .aggregate(Sum("n_calls", alias_name="n_calls"),
                          Sum("sum_turn", alias_name="sum_turn"),
                          Min("first_us", alias_name="first_us"),
                          Max("last_us", alias_name="last_us")))

    def per_tool(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("tool", sort=False)
                  .agg(n_calls=("n_calls", "sum"),
                       n_convs=("conv_id", "size"),
                       sum_turn=("sum_turn", "sum"),
                       first_us=("first_us", "min"),
                       last_us=("last_us", "max"))
                  .reset_index())

    out = hash_copartition(pairs, "tool", per_tool).to_pandas()
    out["n_calls"] = out["n_calls"].astype(np.int64)
    out["n_convs"] = out["n_convs"].astype(np.int64)
    out["mean_turn_idx"] = (out["sum_turn"].to_numpy(np.float64)
                            / out["n_calls"].to_numpy())
    out["first_ts"] = out["first_us"].astype("datetime64[us]")
    out["last_ts"] = out["last_us"].astype("datetime64[us]")
    return (out[["tool", "n_calls", "n_convs", "mean_turn_idx",
                 "first_ts", "last_ts"]]
            .sort_values("tool").reset_index(drop=True))


def turn_dedup(ds: "rd.Dataset", cfg: EngineConfig,
               num_parts: int = 64) -> "rd.Dataset":
    """(doc_id, text_hash, keep) per turn; keep=1 iff the turn's doc key
    is the minimum among turns sharing its normalized-text hash."""
    def stage(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        norm = normalized_text(texts, cfg)
        hs = [hashlib.md5(s.encode()).hexdigest()
              for s in norm.to_pylist()]
        return pa.table({
            "doc_id": _doc_key(conv, batch["turn_idx"]),
            "text_hash": pa.array(hs, type=pa.string()),
        })

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text_hash"].to_numpy()
        d = df["doc_id"].to_numpy()
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        return pd.DataFrame({"doc_id": d, "text_hash": h,
                             "keep": first.astype(np.int64)})

    hashed = ds.select_columns(["conv_id", "turn_idx", "text"]) \
               .map_batches(stage, batch_format="pyarrow")
    return hash_copartition(hashed, "text_hash", bucket, num_parts)


def response_latency(ds: "rd.Dataset",
                     num_parts: int = 64) -> "rd.Dataset":
    """Per-response latency analytics (agent/transcript ops): for every
    turn whose PREVIOUS turn (by turn_idx within the conversation) is a
    'user' turn, the elapsed microseconds since that user turn — the
    "how long did the assistant/tool take to come back" signal a
    serving or SFT-curation pipeline slices by.

    ONE conv_id shuffle (hash co-partition), per-bucket work is a
    lexsort + one shifted diff — integer microseconds end to end, so
    the DuckDB lag-window oracle is exact.  Returns (conv_id, turn_idx,
    role, latency_us) for qualifying turns only (the first turn of a
    conversation and turns following non-user turns emit nothing)."""
    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        conv = df["conv_id"].to_numpy()
        order = np.lexsort((df["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        turn = df["turn_idx"].to_numpy()[order]
        role = df["role"].to_numpy()[order]
        ts = df["ts"].to_numpy()[order].astype("datetime64[us]") \
            .astype(np.int64)
        n = len(conv)
        same = np.zeros(n, dtype=bool)
        same[1:] = conv[1:] == conv[:-1]
        prev_user = np.zeros(n, dtype=bool)
        prev_user[1:] = (role[:-1] == "user") & same[1:]
        lat = np.zeros(n, dtype=np.int64)
        lat[1:] = ts[1:] - ts[:-1]
        keep = prev_user
        return pd.DataFrame({
            "conv_id": conv[keep],
            "turn_idx": turn[keep].astype(np.int64),
            "role": role[keep],
            "latency_us": lat[keep],
        })

    prepped = ds.select_columns(["conv_id", "turn_idx", "role", "ts"])
    return hash_copartition(prepped, "conv_id", bucket, num_parts)


def tool_transitions(ds: "rd.Dataset",
                     num_parts: int = 64) -> "rd.Dataset":
    """Tool-transition matrix (agent-trajectory analytics): counts of
    (prev_tool -> tool) transitions over consecutive TOOL-BEARING turns
    within each conversation — the "which tool follows which" signal an
    agent-pipeline curriculum or router slices on.  Turns without a
    tool ('' sentinel or NULL) are skipped, not transition breaks: the
    chain runs over the conversation's tool-bearing subsequence (the
    lag-over-filtered-window rule the oracle shares).

    ONE conv_id shuffle; per bucket a lexsort + one shifted compare;
    per-bucket output is transition-pair-bounded (tools x tools), and
    ONE tiny groupby merges bucket partials.  Returns
    (prev_tool, tool, n_transitions)."""
    from ray.data.aggregate import Sum

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df["tool"].notna() & (df["tool"] != "")
        df = df[m]
        if df.empty:
            return pd.DataFrame({"prev_tool": pd.Series(dtype=object),
                                 "tool": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        conv = df["conv_id"].to_numpy()
        order = np.lexsort((df["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        tool = df["tool"].to_numpy()[order]
        same = np.zeros(len(conv), dtype=bool)
        same[1:] = conv[1:] == conv[:-1]
        prev = np.empty_like(tool)
        prev[1:] = tool[:-1]
        keep = same
        out = pd.DataFrame({"prev_tool": prev[keep],
                            "tool": tool[keep]})
        g = out.groupby(["prev_tool", "tool"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    prepped = ds.select_columns(["conv_id", "turn_idx", "tool"])
    partials = hash_copartition(prepped, "conv_id", bucket, num_parts)
    return (partials.groupby(["prev_tool", "tool"])
                    .aggregate(Sum("n", alias_name="n_transitions")))
