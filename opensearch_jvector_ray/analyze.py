"""Vectorized text analysis (tokenizer + stopword filter + positions).

The analog of the Lucene analysis chain the reference delegates to
(StandardAnalyzer tokenization -> lowercase -> stop filter), visible in the
repo only as the postings delegate (`KNN10010Codec.java:39-41`); the
per-field transform hook structure mirrors `NormalizeVectorTransformer` /
`PerDimensionProcessor` (`KNNVectorFieldMapper.java:611-642`) — a pure,
stateless, batch-vectorized transform applied before indexing.

Everything here is Arrow-native: `pyarrow.compute.utf8_lower` +
`split_pattern_regex` (RE2) + `list_flatten`/`list_parent_indices`, then
numpy for group-wise position numbering. No Python loop touches a token.

Semantics (documented invariants, mirrored exactly by the DuckDB oracle SQL
and the brute-force test oracle):
  - token     = maximal run not matching ``cfg.split_pattern`` after
                optional lowercasing; empty strings dropped.
  - position  = 0-based index of the token within its document counted
                BEFORE stopword removal (stop filter leaves position gaps,
                like Lucene's StopFilter with enablePositionIncrements).
  - doc_len   = number of tokens AFTER stopword removal (what the BM25
                norm counts — Lucene's FieldInvertState.length counts only
                emitted tokens).
  - null/empty text -> zero tokens, doc_len 0 (docs may miss the field;
    reference test `KNNJVectorTests.java:113-169`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from opensearch_jvector_ray.config import EngineConfig

# the minimal-english s-stemmer rule (Lucene EnglishMinimalStemmer.stem
# public semantics) as ONE RE2 pattern: final 's' dropped iff the token
# has >= 2 preceding chars and the char before the 's' is not 'u'/'s'.
# Shared verbatim by the engine (pyarrow replace_substring_regex) and
# the DuckDB oracle (regexp_replace) — verified char-identical on both.
STEM_PATTERN = r"^(..*[^us])s$"


@dataclass
class TokenStream:
    """Flat token table for one batch of documents.

    ``doc_idx`` indexes into the batch's rows (int32, non-decreasing);
    ``terms`` / ``positions`` are parallel arrays of surviving
    (post-stopword) tokens; ``doc_len`` has one entry per input row.
    """

    doc_idx: np.ndarray      # int32 [n_tokens]
    terms: pa.Array          # string [n_tokens]
    positions: np.ndarray    # int32 [n_tokens]
    doc_len: np.ndarray      # int32 [n_docs]


def _positions_within_groups(parents: np.ndarray) -> np.ndarray:
    """0-based rank of each element within its (sorted, contiguous) group."""
    n = len(parents)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    idx = np.arange(n, dtype=np.int64)
    # index of the first element of each group, broadcast to group members
    boundary = np.ones(n, dtype=bool)
    boundary[1:] = parents[1:] != parents[:-1]
    group_start = idx[boundary]
    starts_for_each = np.repeat(group_start, np.diff(np.append(group_start, n)))
    return (idx - starts_for_each).astype(np.int32)


def tokenize(texts: pa.Array | pa.ChunkedArray, cfg: EngineConfig) -> TokenStream:
    """Tokenize a column of documents into a flat (doc, term, pos) stream."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    lowered = pc.utf8_lower(texts) if cfg.lowercase else texts
    token_lists = pc.split_pattern_regex(lowered, pattern=cfg.split_pattern)
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists).to_numpy(zero_copy_only=False)

    # drop empty tokens produced by leading/trailing separators
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    parents = parents[nonempty]

    positions = _positions_within_groups(parents)

    if cfg.stopwords:
        stop = pc.is_in(flat, value_set=pa.array(list(cfg.stopwords), type=pa.string()))
        keep = np.invert(stop.to_numpy(zero_copy_only=False))
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        positions = positions[keep]

    if cfg.stemmer == "minimal_english":
        # Lucene EnglishMinimalStemFilter (Harman s-stemmer): strip a
        # final 's' iff len >= 3 and the preceding char is not 'u'/'s'.
        # Applied AFTER the stop filter (Lucene's stop->stem chain
        # order); ONE RE2 pass, the pattern is STEM_PATTERN shared
        # verbatim with the DuckDB oracle (oracles.toks_cte).
        flat = pc.replace_substring_regex(
            flat, pattern=STEM_PATTERN, replacement=r"\1")

    doc_len = np.bincount(parents, minlength=n_docs).astype(np.int32)
    # int32 throughout: a segment holds < 2^31 docs by construction, and
    # halving the sort/gather traffic measurably helps build scaling on
    # memory-bandwidth-bound nodes
    return TokenStream(doc_idx=parents.astype(np.int32), terms=flat,
                       positions=positions, doc_len=doc_len)


def analyze_query(text: str, cfg: EngineConfig) -> list[str]:
    """Analyze a query string with the exact same chain as indexing.

    Returns the surviving terms in order (duplicates preserved — a repeated
    query term contributes its BM25 score once per occurrence, matching
    Lucene's one-TermQuery-per-token BooleanQuery expansion).
    """
    stream = tokenize(pa.array([text], type=pa.string()), cfg)
    return stream.terms.to_pylist()


def parse_boolean_query(text: str, cfg: EngineConfig,
                        ) -> tuple[list[str], list[str], list[str]]:
    """Lucene simple-query-string style clause parsing: ``+chunk`` = MUST,
    ``-chunk`` = MUST_NOT, bare = SHOULD.  Each chunk runs through the
    full analysis chain (may yield 0..n terms).  Returns
    (should, must, must_not) term lists in appearance order."""
    should: list[str] = []
    must: list[str] = []
    must_not: list[str] = []
    for chunk in text.split():
        target = should
        if chunk.startswith("+"):
            target, chunk = must, chunk[1:]
        elif chunk.startswith("-"):
            target, chunk = must_not, chunk[1:]
        target.extend(analyze_query(chunk, cfg))
    return should, must, must_not


def query_term_weights(text: str, cfg: EngineConfig) -> list[tuple[str, int]]:
    """(term, occurrence_count) in first-appearance order."""
    terms = analyze_query(text, cfg)
    out: dict[str, int] = {}
    for t in terms:
        out[t] = out.get(t, 0) + 1
    return list(out.items())


def parse_simple_query_string(text: str, cfg: EngineConfig,
                              ) -> list[dict]:
    """simple_query_string parsing [OpenSearch simple_query_string
    public semantics — the ``+`` / ``-`` / ``"phrase"`` / trailing-``*``
    flag subset with default_operator=OR; ``|`` alternation and ``()``
    grouping are not supported, a documented subset like the
    search-template mustache subset].

    Units split on whitespace EXCEPT inside double quotes.  A unit's
    leading ``+`` marks MUST, ``-`` MUST_NOT, bare is SHOULD.  A quoted
    unit analyzes to an ordered phrase (one-word phrases collapse to a
    term clause — the tf formulas coincide); a unit ending in ``*`` is
    a prefix clause (stem lowercased verbatim — the wildcard
    analysis-bypass rule shared with parse_prefix_query); any other
    unit analyzes fully, duplicate terms within a unit carrying
    occurrence weights.  Units that analyze to nothing (pure stopwords)
    are dropped, as Lucene drops empty clauses.  Returns clause dicts
    ``{occur, kind, ...}`` in appearance order."""
    import re as _re
    clauses: list[dict] = []
    for u in _re.findall(r'[+-]?"[^"]*"|\S+', text):
        occur = "should"
        if u.startswith("+"):
            occur, u = "must", u[1:]
        elif u.startswith("-"):
            occur, u = "must_not", u[1:]
        if not u:
            continue
        if u.startswith('"') and u.endswith('"') and len(u) >= 2:
            words = analyze_query(u[1:-1], cfg)
            if not words:
                continue
            if len(words) == 1:
                clauses.append({"occur": occur, "kind": "terms",
                                "tw": [(words[0], 1)]})
            else:
                clauses.append({"occur": occur, "kind": "phrase",
                                "words": words})
        elif u.endswith("*"):
            # respect cfg.lowercase — a force-lowered stem can never
            # match a case-sensitive index's vocabulary
            stem = u[:-1].lower() if cfg.lowercase else u[:-1]
            if not stem:
                raise ValueError("empty prefix stem: bare '*' not "
                                 "allowed (allowLeadingWildcard=false)")
            clauses.append({"occur": occur, "kind": "prefix",
                            "prefix": stem})
        else:
            tw = query_term_weights(u, cfg)
            if tw:
                clauses.append({"occur": occur, "kind": "terms",
                                "tw": tw})
    return clauses


def wildcard_to_regex(pattern: str) -> str:
    """Lucene WildcardQuery translation: ``*`` -> ``.*``, ``?`` -> ``.``,
    everything else literal (re.escape emits RE2-compatible escapes, and
    DuckDB's regex engine is also RE2 — the translated pattern is shared
    verbatim with the oracle)."""
    import re as _re
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def parse_boosted_query(text: str, cfg: EngineConfig,
                        ) -> list[tuple[str, float]]:
    """Lucene query-string boost syntax: a whitespace chunk may carry a
    trailing ``^boost`` (non-negative float) — ``fast^2 merge`` weights
    the 'fast' clause 2x.  The stem analyzes through the full chain
    (may yield 0..n terms, each inheriting the boost); weights for the
    same term ADD across chunks; a chunk whose suffix does not parse as
    a float keeps its '^' and analyzes literally.  Returns (term,
    weight) in first-appearance order."""
    weights: dict[str, float] = {}
    order: list[str] = []
    for chunk in text.split():
        boost = 1.0
        if "^" in chunk:
            stem, _, bs = chunk.rpartition("^")
            try:
                val = float(bs)
            except ValueError:
                pass                       # not a boost -> literal chunk
            else:
                if val < 0:
                    raise ValueError(f"negative boost in {chunk!r}")
                import math
                if not math.isfinite(val):
                    # 'fast^nan' would poison every matching doc's
                    # score and make the tie order arbitrary
                    raise ValueError(f"non-finite boost in {chunk!r}")
                boost, chunk = val, stem
        for t in analyze_query(chunk, cfg):
            if t not in weights:
                order.append(t)
                weights[t] = 0.0
            weights[t] += boost
    return [(t, weights[t]) for t in order]


def mbp_rewrite(text: str) -> str:
    """match_bool_prefix rewrite [OpenSearch match_bool_prefix public
    semantics]: the LAST whitespace chunk matches as a prefix, earlier
    chunks as regular terms — i.e. "a b c" -> "a b c*", then the
    standard trailing-wildcard path.  ONE shared rewrite consumed by
    both the engine (match_bool_prefix) and the generated oracle, so
    the clause split can never drift."""
    chunks = text.split()
    if not chunks:
        return text
    if not chunks[-1].endswith("*"):
        chunks[-1] += "*"
    return " ".join(chunks)


def parse_prefix_query(text: str, cfg: EngineConfig,
                       ) -> tuple[list[tuple[str, int]], list[str]]:
    """Lucene query-string style trailing-wildcard parsing: a whitespace
    chunk ending in ``*`` is a PREFIX clause (stem lowercased verbatim —
    multi-term wildcards are not analyzed further, matching Lucene's
    rule that wildcard terms bypass the analysis chain); every other
    chunk runs through the full analysis chain and scores as a literal
    term.  Returns (literal (term, count) list in first-appearance
    order, unique prefix stems in first-appearance order).

    Duplicate prefix clauses within one query are deduplicated (each
    unique prefix contributes its expansion once); a bare ``*`` (empty
    stem — an unbounded leading wildcard) is rejected, as in Lucene's
    default allowLeadingWildcard=false posture.
    """
    lits: list[str] = []
    prefixes: list[str] = []
    for chunk in text.split():
        if chunk.endswith("*"):
            stem = chunk[:-1].lower() if cfg.lowercase else chunk[:-1]
            if not stem:
                raise ValueError("empty prefix stem: bare '*' not allowed")
            if stem not in prefixes:
                prefixes.append(stem)
        else:
            lits.extend(analyze_query(chunk, cfg))
    out: dict[str, int] = {}
    for t in lits:
        out[t] = out.get(t, 0) + 1
    return list(out.items()), prefixes


def analyze_api(texts: "dict", cfg: EngineConfig) -> "pd.DataFrame":
    """_analyze API [OpenSearch indices-analyze public semantics]: the
    analyzer's surviving token stream for each given text as one
    (doc_id, pos, token) row per token.  ``pos`` is the 0-based index
    on the non-empty token stream BEFORE stopword removal (StopFilter
    position-increment gaps — the axis the positions sidecar stores and
    the phrase scorer consumes); ``token`` is the post-stop,
    post-stem term.  Request-sized: ONE vectorized tokenize over the
    given texts, no index access."""
    import numpy as np
    import pandas as pd
    ids = sorted(texts)
    cols = ["doc_id", "pos", "token"]
    if not ids:
        return pd.DataFrame(columns=cols)
    stream = tokenize(pa.array([texts[i] for i in ids],
                               type=pa.string()), cfg)
    return pd.DataFrame({
        "doc_id": np.asarray(ids)[stream.doc_idx],
        "pos": stream.positions.astype(np.int64),
        "token": stream.terms.to_numpy(zero_copy_only=False),
    })
