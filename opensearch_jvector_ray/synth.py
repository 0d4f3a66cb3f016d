"""Deterministic synthetic transcript corpus (the `input_hint` table).

Schema (exactly `BASELINE.json:input_hint` / FIXTURES.md §1):
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp[us]

Determinism: every conversation is generated from its own counter-based
RNG stream (`np.random.Philox(key=seed, counter=conv_id)`), so the corpus
is bit-identical regardless of batch/partition boundaries or parallelism —
the property that makes build retries and the two-parallelism-level
scaling benchmark apples-to-apples.

Vocabulary is Zipf-distributed (s≈1.07) over a fixed word list so head
terms ("data", "model", ...) exercise the head-term/skew paths, plus
planted marker phrases at known (conv_id, turn_idx) positions so golden
query answers are hand-checkable (FIXTURES.md §1).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

SEED = 42
VOCAB_CORE = (
    "data model agent tool user query search index token batch stream "
    "result error retry plan code test file table row column merge sort "
    "filter join group shard segment score rank vector text turn message "
    "context prompt answer question system assistant response action state "
    "memory cache disk network node cluster task worker driver schedule "
    "latency throughput partition checkpoint lineage metric log trace debug"
).split()
VOCAB = VOCAB_CORE + [f"term{i:04d}" for i in range(2000 - len(VOCAB_CORE))]
ROLES = ("user", "assistant")
TOOLS = ("", "search_tool", "code_tool", "file_tool")

# planted phrases -> appear at (conv_id % 97 == 0, turn_idx == 1)
PLANT_EVERY = 97
PLANT_PHRASE = "zebra quantum nebula"


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


_PROBS = _zipf_probs(len(VOCAB))


def generate_conversations(conv_ids: np.ndarray, seed: int = SEED) -> pa.Table:
    """Generate all turns for the given conversation ids (vectorized over
    the batch; one Philox stream per conversation for partition-invariant
    determinism)."""
    conv_col: list[str] = []
    turn_col: list[int] = []
    role_col: list[str] = []
    text_col: list[str] = []
    tool_col: list[str] = []
    ts_col: list[int] = []
    base_us = 1_700_000_000_000_000  # fixed epoch base (us)
    for cid in conv_ids.tolist():
        rng = np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, int(cid)]))
        n_turns = int(rng.integers(4, 21))
        lens = rng.integers(5, 31, size=n_turns)
        words = rng.choice(len(VOCAB), size=int(lens.sum()), p=_PROBS)
        tool_draw = rng.integers(0, 12, size=n_turns)
        off = 0
        name = f"conv-{cid:07d}"
        for t in range(n_turns):
            toks = [VOCAB[w] for w in words[off:off + lens[t]]]
            off += int(lens[t])
            text = " ".join(toks)
            if cid % PLANT_EVERY == 0 and t == 1:
                text = text + " " + PLANT_PHRASE
            is_tool = tool_draw[t] == 0
            conv_col.append(name)
            turn_col.append(t)
            role_col.append("tool" if is_tool else ROLES[t % 2])
            text_col.append(text)
            tool_col.append(TOOLS[1 + (int(cid) + t) % 3] if is_tool else "")
            ts_col.append(base_us + int(cid) * 10_000_000 + t * 1_000)
    return pa.table({
        "conv_id": pa.array(conv_col, type=pa.string()),
        "turn_idx": pa.array(turn_col, type=pa.int32()),
        "role": pa.array(role_col, type=pa.string()),
        "text": pa.array(text_col, type=pa.string()),
        "tool": pa.array(tool_col, type=pa.string()),
        "ts": pa.array(ts_col, type=pa.timestamp("us")),
    })


def synth_dataset(n_convs: int, seed: int = SEED) -> "rd.Dataset":
    """Transcripts as a Ray Dataset (generation itself is parallel)."""
    ds = rd.range(n_convs)
    def gen(batch: pa.Table) -> pa.Table:
        return generate_conversations(batch["id"].to_numpy(), seed=seed)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=512)


def synth_parquet(n_convs: int, seed: int = SEED,
                  root: str = "/tmp/ojr_synth") -> str:
    """Write (once, cached) the corpus to parquet; returns the directory."""
    out = os.path.join(root, f"transcripts_seed{seed}_n{n_convs}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    # stage into a process-private tmp dir and atomically rename: two
    # concurrent callers (e.g. pytest + bench in parallel) must never
    # interleave their parquet files into one directory — the rename
    # loser discards its copy (identical content: synthesis is
    # deterministic), and a crashed writer never leaves a half-written
    # blessed dir
    import shutil
    tmp = f"{out}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    synth_dataset(n_convs, seed).write_parquet(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out)
    except OSError:
        if os.path.exists(marker):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            # stale marker-less dir from an old crashed run: replace
            shutil.rmtree(out, ignore_errors=True)
            os.rename(tmp, out)
    return out


def n_convs_for_sf(sf: float) -> int:
    """Scale mapping used by bench + entry: sf0.001 ~ 200 convs (~2.4k
    turns), sf0.01 ~ 2k convs, sf0.1 ~ 20k convs (~240k turns)."""
    return max(8, int(round(sf * 200_000)))


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01
