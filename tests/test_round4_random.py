"""Randomized property tests for the round-4 stage functions.

The stages are pure (pa.Table -> pa.Table), so hypothesis drives them
directly — no Ray in the example loop.  Each compares the vectorized
engine against an obviously-correct per-doc Python reference.
"""

import math
import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines.textstats import (
    BPE_PATTERN, GOPHER_DEFAULTS, bpe_count_stage, gopher_filter_stage,
)

CFG = EngineConfig()

WORDS = ["the", "data", "model", "of", "spam", "a1", "42", "zx", "agent",
         "tool", "verylongtokenhere", "b"]

texts_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=40)
    .map(" ".join),
    min_size=1, max_size=12)


def _table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


def _brute_gopher(text: str, p: dict) -> tuple[int, int]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    nt = len(toks)
    safe = max(nt, 1)
    mean_len = sum(len(t) for t in toks) / safe
    n_stop = sum(t in CFG.stopwords for t in toks)
    alpha = sum(bool(re.search("[a-z]", t)) for t in toks) / safe
    dt = len(set(toks))
    bigrams = list(zip(toks, toks[1:]))
    nb = max(nt - 1, 0)
    db = len(set(bigrams))
    dup_tok = 1.0 - dt / safe if nt > 0 else 0.0
    dup_big = 1.0 - db / max(nb, 1) if nb > 0 else 0.0
    mask = 0
    if nt < p["min_tokens"] or nt > p["max_tokens"]:
        mask |= 1
    if mean_len < p["min_mean_len"] or mean_len > p["max_mean_len"]:
        mask |= 2
    if n_stop < p["min_stop_hits"]:
        mask |= 4
    if alpha < p["min_alpha_ratio"]:
        mask |= 8
    if dup_tok > p["max_dup_token_ratio"]:
        mask |= 16
    if dup_big > p["max_dup_bigram_ratio"]:
        mask |= 32
    return nt, mask


@settings(max_examples=60, deadline=None)
@given(texts=texts_strategy,
       min_tokens=st.integers(0, 20),
       max_dup=st.sampled_from([0.0, 0.25, 0.5, 0.9]))
def test_gopher_filter_matches_brute(texts, min_tokens, max_dup):
    p = {**GOPHER_DEFAULTS, "min_tokens": min_tokens,
         "max_dup_token_ratio": max_dup}
    fn = gopher_filter_stage(CFG, "doc_id", "text", min_tokens=min_tokens,
                             max_dup_token_ratio=max_dup)
    got = fn(_table(texts))
    for i, text in enumerate(texts):
        nt, mask = _brute_gopher(text, p)
        assert got["n_tokens_all"][i].as_py() == nt, text
        assert got["fail_mask"][i].as_py() == mask, (text, p)
        assert got["keep"][i].as_py() == int(mask == 0)


@settings(max_examples=60, deadline=None)
@given(texts=st.lists(st.text(
    alphabet="ab1 ,.'!\t\n", min_size=0, max_size=60),
    min_size=1, max_size=8))
def test_bpe_count_matches_re(texts):
    got = bpe_count_stage("doc_id", "text")(_table(texts))
    for i, text in enumerate(texts):
        assert got["n_ws_tokens"][i].as_py() == len(re.findall(r"\S+", text))
        assert got["n_bpe_tokens"][i].as_py() == \
            len(re.findall(BPE_PATTERN, text)), repr(text)


def test_lm_xent_random_corpora_match_brute():
    """Engine vs per-doc Python reference over random corpora (train =
    score corpus), several seeds; float compares are EXACT because both
    sides do integer-micro sums and one identical division."""
    import ray.data as rd
    from opensearch_jvector_ray.pipelines import lm as lm_pl

    for seed in range(4):
        rng = np.random.default_rng(seed)
        texts = [" ".join(rng.choice(WORDS,
                                     size=rng.integers(0, 25)).tolist())
                 for _ in range(30)]
        ds = rd.from_arrow(_table(texts))
        got = lm_pl.lm_xent(ds, CFG, "doc_id", "text").to_pandas() \
                   .sort_values("doc_id").reset_index(drop=True)
        counts: dict[str, int] = {}
        for t in texts:
            for w in t.split():
                counts[w] = counts.get(w, 0) + 1
        T, V = sum(counts.values()), len(counts)
        denom = max(float(T) + float(V), 1.0)
        q = {w: math.floor(math.log((c + 1.0) / denom) * 1e6)
             for w, c in counts.items()}
        for i, t in enumerate(texts):
            ws = t.split()
            exp = (-float(sum(q[w] for w in ws)) / (len(ws) * 1e6)
                   if ws else 0.0)
            assert got["xent"][i] == exp, (seed, i, t)
