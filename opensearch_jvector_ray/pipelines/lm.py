"""Unigram language-model training + per-document cross-entropy scoring —
the CCNet-style LM quality signal (Wenzek et al. 2020 use a KenLM; the
public rule family is "score each document by a corpus-level LM and filter
on perplexity").  A first-class training-data-pipeline operator (not in
the reference, which has no corpus-prep layer).

Shape at 100 TB:
  - TRAIN is a combiner-first term-count aggregate: per-batch
    ``value_counts`` partials ride the one narrow ``groupby(term)``
    shuffle (token stream never shuffles), exactly the A2 global-stats
    pattern in ``stages/build.py``.  The trained model is vocabulary-sized
    (Heaps' law: ~1e8 terms at 1e13 tokens) — the designated SMALL side.
  - The model is broadcast ONCE: count blocks stay in the object store
    (``to_arrow_refs``) and each scoring worker assembles its lookup
    (vocab Arrow array + int64 micro-log-prob table) once per WORKER via
    the shared ``_cached_from_refs`` cache — never per batch.
  - SCORE is a stateless vectorized ``map_batches`` pass: tokenize,
    ``pc.index_in`` against the vocab, one ``np.bincount`` per batch.

Exactness (the hard-oracle trick): per-term log-probs are quantized to
integer MICRO units *before* the per-document sum —
``q(w) = floor(ln((c(w)+1)/(T+V)) * 1e6)`` — so the per-doc aggregate
``sum(count * q)`` is INTEGER arithmetic: associative, order-free, and
bit-identical between numpy and DuckDB regardless of summation order
(the float-order pinning that BM25 needs is unnecessary here).  ``floor``
has no round-half tie hazard.  The only float ops are the single ln/div
per vocabulary term (same IEEE inputs on both sides) and ONE final
division per doc — identical integer inputs, so the result double is
bit-equal UNROUNDED (round(,6) would reintroduce the half-tie hazard:
micro/(n*1e6) lands exactly on .5 decimal boundaries whenever n divides
micro, and numpy half-to-even disagrees with DuckDB half-away there).

Smoothing is add-one (Laplace): p(w) = (c(w)+1) / (T+V); unseen tokens
(scoring a corpus the LM wasn't trained on) get p = 1/(T+V).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines.dedup import _cached_from_refs
from opensearch_jvector_ray.pipelines.textstats import _token_lists

MICRO = 1_000_000.0


@dataclasses.dataclass(frozen=True)
class UnigramLM:
    """Trained model handle: (term, cnt) blocks in the object store plus
    the two global scalars.  ``denom`` = T + V as float64 — computed ONCE
    here so engine and oracle share the exact same IEEE value."""
    refs: tuple
    total_tokens: int
    vocab_size: int

    @property
    def denom(self) -> float:
        # max(,1): a zero-token training corpus degenerates to q_oov=0
        # (xent 0.0 everywhere) instead of ln(1/0)
        return max(float(self.total_tokens) + float(self.vocab_size), 1.0)

    @property
    def q_oov(self) -> int:
        return int(math.floor(math.log(1.0 / self.denom) * MICRO))


def train_unigram_lm(ds: "rd.Dataset", cfg: EngineConfig,
                     text_col: str) -> UnigramLM:
    """Count every non-empty lowered token (stopwords KEPT — the LM models
    raw text structure, same token stream as ``repetition_stage``)."""
    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat = pc.list_flatten(_token_lists(texts, cfg))
        vc = flat.value_counts()
        return pa.table({"term": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("term")
                .aggregate(Sum("cnt", alias_name="cnt"))
                .materialize())
    agg = counts.aggregate(Sum("cnt", alias_name="total"))
    raw = agg["total"] if isinstance(agg, dict) else agg
    total = int(raw) if raw is not None else 0   # Sum over empty -> None
    vocab = counts.count()
    return UnigramLM(refs=tuple(counts.to_arrow_refs()),
                     total_tokens=total, vocab_size=vocab)


def _build_lut(tbls, denom: float):
    if not tbls:                                  # zero-token training corpus
        return pa.array([], type=pa.string()), np.zeros(0, dtype=np.int64)
    cat = pa.concat_tables(tbls).combine_chunks()
    vocab = cat["term"].combine_chunks()
    cnt = cat["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    qmicro = np.floor(np.log((cnt + 1.0) / denom) * MICRO).astype(np.int64)
    return vocab, qmicro


def lm_score_stage(lm: UnigramLM, cfg: EngineConfig, id_col: str,
                   text_col: str):
    """(id, n_tokens_all, xent) — xent = mean negative log-prob per token
    (natural log), 0.0 for empty docs, round(6).  Stateless task UDF with
    a per-worker LUT cache (the dedup broadcast pattern)."""
    refs, denom, q_oov = lm.refs, lm.denom, lm.q_oov

    def build(tbls):
        return _build_lut(tbls, denom)

    def fn(batch: pa.Table) -> pa.Table:
        vocab, qmicro = _cached_from_refs(refs, build)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = _token_lists(texts, cfg)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        idx = pc.index_in(flat, value_set=vocab).fill_null(-1) \
                .to_numpy(zero_copy_only=False)
        if qmicro.size == 0:
            # empty-vocabulary LM (all-empty training corpus): every
            # token is OOV — np.where evaluates both branches, so the
            # gather below would IndexError on the size-0 LUT
            qvals = np.full(len(idx), float(q_oov))
        else:
            qvals = np.where(idx >= 0, qmicro[np.maximum(idx, 0)],
                             np.int64(q_oov)).astype(np.float64)
        # integer-valued weights, per-doc magnitudes << 2^53: the bincount
        # float accumulation is EXACT, hence order-free
        micro = np.bincount(parents, weights=qvals, minlength=n_rows)
        n_tok = np.bincount(parents, minlength=n_rows).astype(np.int64)
        # NO round: both sides perform ONE identical IEEE division on
        # identical integers, so the doubles are bit-equal by construction
        # (round(,6) would reintroduce the half-tie hazard: micro/(n*1e6)
        # lands exactly on .5 boundaries whenever n divides micro).
        xent = np.where(n_tok > 0,
                        -micro / (np.maximum(n_tok, 1) * MICRO), 0.0)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens_all": pa.array(n_tok),
            "xent": pa.array(xent),
        })
    return fn


def lm_xent(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
            text_col: str, *, lm: UnigramLM | None = None) -> "rd.Dataset":
    """Train on ``ds`` (unless a pre-trained ``lm`` is given — the
    decontamination-style train-on-A-score-on-B path) and score every
    document.  Returns a Dataset (table-sized at scale)."""
    if lm is None:
        lm = train_unigram_lm(ds, cfg, text_col)
    return ds.map_batches(lm_score_stage(lm, cfg, id_col, text_col),
                          batch_format="pyarrow")


def dsir_stage(lm_target: UnigramLM, lm_source: UnigramLM,
               cfg: EngineConfig, id_col: str, text_col: str):
    """(id, n_tokens_all, log_weight) — the DSIR log importance weight
    sum(c_w * (q_t(w) - q_s(w))) / MICRO; both per-term logs are
    micro-quantized BEFORE the difference and the per-doc sum, so the
    aggregate is exact integer arithmetic (order-free).  0.0 for empty
    docs; the single final division is UNROUNDED (identical integer
    inputs -> bit-equal doubles)."""
    refs_t, denom_t, oov_t = lm_target.refs, lm_target.denom, \
        lm_target.q_oov
    refs_s, denom_s, oov_s = lm_source.refs, lm_source.denom, \
        lm_source.q_oov

    def build_t(tbls):
        return _build_lut(tbls, denom_t)

    def build_s(tbls):
        return _build_lut(tbls, denom_s)

    def fn(batch: pa.Table) -> pa.Table:
        vocab_t, q_t = _cached_from_refs(refs_t, build_t)
        vocab_s, q_s = _cached_from_refs(refs_s, build_s)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = _token_lists(texts, cfg)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        it = pc.index_in(flat, value_set=vocab_t).fill_null(-1) \
            .to_numpy(zero_copy_only=False)
        is_ = pc.index_in(flat, value_set=vocab_s).fill_null(-1) \
            .to_numpy(zero_copy_only=False)
        qt = (np.full(len(it), np.int64(oov_t)) if q_t.size == 0
              else np.where(it >= 0, q_t[np.maximum(it, 0)],
                            np.int64(oov_t)))
        qs = (np.full(len(is_), np.int64(oov_s)) if q_s.size == 0
              else np.where(is_ >= 0, q_s[np.maximum(is_, 0)],
                            np.int64(oov_s)))
        # integer-valued weights, per-doc magnitudes << 2^53: exact
        micro = np.bincount(parents, weights=(qt - qs).astype(np.float64),
                            minlength=n_rows)
        n_tok = np.bincount(parents, minlength=n_rows).astype(np.int64)
        logw = np.where(n_tok > 0, micro / MICRO, 0.0)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens_all": pa.array(n_tok),
            "log_weight": pa.array(logw),
        })
    return fn


def dsir_weights(source_ds: "rd.Dataset", target_ds: "rd.Dataset",
                 cfg: EngineConfig, id_col: str, text_col: str,
                 *, target_text_col: str | None = None) -> "rd.Dataset":
    """DSIR data-selection importance weights [Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — public
    algorithm; unigram-feature variant (the paper hashes n-grams; the
    estimator shape is identical)]: every SOURCE doc scores
    log w(x) = sum_w c_w(x) * (ln p_target(w) - ln p_source(w)) with
    add-one unigram LMs for both distributions — high weight = looks
    like the target corpus, the resampling key for pretraining-data
    selection.

    100-TB shape: two combiner-first LM trainings (ONE narrow
    groupby(term) each — the A2 pattern; token streams never shuffle),
    both vocabulary-sized models broadcast once per worker
    (`_cached_from_refs`), then ONE stateless vectorized scoring pass
    over the source.  Exactness: the lm.py integer-micro trick applied
    to the DIFFERENCE of the two quantized logs — per-doc sums are
    order-free integers, the single final division is unrounded."""
    lm_t = train_unigram_lm(target_ds, cfg,
                            target_text_col or text_col)
    lm_s = train_unigram_lm(source_ds, cfg, text_col)
    return source_ds.map_batches(
        dsir_stage(lm_t, lm_s, cfg, id_col, text_col),
        batch_format="pyarrow")
