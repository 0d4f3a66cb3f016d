"""Engine configuration.

The analog of the reference's explicit per-field mapping with plugin-side
validation and defaulting (`KNNVectorFieldMapper.java:97-212`, parameter
resolution at `:327-367,436-475`) and the settings registry
(`KNNSettings.java:69-726`).  We validate everything up front in a frozen
dataclass instead of a dynamic settings loop (batch engine — no dynamic
cluster updates needed).

Perf-shaping defaults mirror the reference where a direct analog exists:
  - ``block_size=128``        — postings are encoded in 128-posting blocks
                                 with per-block max metadata, like Lucene's
                                 128-doc postings blocks with impacts.
  - ``over_query_factor=5``   — first-pass over-query multiplier
                                 (`KNNConstants.java:119`).
  - rescore clamp [100,10000] — `RescoreContext.java:17-97` (MIN/MAX
                                 first-pass k).
  - ``k1=1.2, b=0.75``        — Lucene BM25Similarity defaults.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict

# Lucene EnglishAnalyzer's default stop set (public semantics). The
# reference's text path delegates analysis to Lucene's StandardAnalyzer /
# stop filtering (delegation point `KNN10010Codec.java:39-41`).
LUCENE_ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

# RE2-compatible split pattern: a token is a maximal run of letters/digits.
# Used identically by pyarrow (RE2) on the Ray side and by DuckDB's
# regexp_split_to_array (also RE2) in the oracle SQL, so tokenization is
# engine-identical on both sides of the correctness gate.
DEFAULT_SPLIT_PATTERN = r"[^a-z0-9]+"
UNICODE_SPLIT_PATTERN = r"[^\p{L}\p{N}]+"


@dataclass(frozen=True)
class EngineConfig:
    """Validated engine configuration (immutable once constructed)."""

    # --- analyzer (M4/M6 in SURVEY.md §2.2) ---
    lowercase: bool = True
    split_pattern: str = DEFAULT_SPLIT_PATTERN
    stopwords: tuple[str, ...] = LUCENE_ENGLISH_STOPWORDS
    with_positions: bool = True
    stemmer: str = ""              # "" | "minimal_english" (the Lucene
                                   # EnglishMinimalStemFilter s-stemmer,
                                   # applied AFTER the stop filter; the
                                   # rule is one RE2 regexp shared
                                   # verbatim with the DuckDB oracle)

    # --- BM25 (Lucene BM25Similarity form: idf * tf/(tf+k1*(1-b+b*dl/avgdl))) ---
    k1: float = 1.2
    b: float = 0.75

    # --- index layout ---
    num_segments: int = 8          # doc partitions (hash(conv_id) % P)
    block_size: int = 128          # postings per block (block-max unit)
    codec: str = "varint"          # posting-block codec: varint | pfor
                                   # (pfor = per-block frame-of-reference
                                   # bit packing, the PForDelta analog)
    target_docs_per_segment: int = 2_000_000  # used by auto-sizing at scale

    # --- query defaults ---
    default_k: int = 10
    over_query_factor: int = 5         # KNNConstants.java:119
    rescore_min_first_pass_k: int = 100    # RescoreContext.java MIN_FIRST_PASS_RESULTS
    rescore_max_first_pass_k: int = 10000  # RescoreContext.java MAX_FIRST_PASS_RESULTS
    max_k: int = 10000                  # KNNQueryBuilder.java:80 (K_MAX)

    # --- build behavior ---
    last_write_wins: bool = False   # dedup (conv_id, turn_idx) by max ts (D3)
    salt_threshold: int = 1 << 20   # postings per term above which term-stat
                                    # partials are salted in the dictionary agg

    def __post_init__(self) -> None:
        if self.k1 < 0:
            raise ValueError(f"k1 must be >= 0, got {self.k1}")
        if not (0.0 <= self.b <= 1.0):
            raise ValueError(f"b must be in [0,1], got {self.b}")
        if self.num_segments < 1:
            raise ValueError(f"num_segments must be >= 1, got {self.num_segments}")
        if self.block_size < 1:
            raise ValueError(f"block_size must be >= 1, got {self.block_size}")
        if self.default_k < 1 or self.default_k > self.max_k:
            raise ValueError(f"default_k must be in [1,{self.max_k}]")
        if self.codec not in ("varint", "pfor"):
            raise ValueError(f"codec must be 'varint' or 'pfor', got {self.codec!r}")
        if self.stemmer not in ("", "minimal_english"):
            raise ValueError(f"stemmer must be '' or 'minimal_english', "
                             f"got {self.stemmer!r}")
        object.__setattr__(self, "stopwords", tuple(self.stopwords))

    # -- serialization (manifests record the exact config that built a segment)
    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "EngineConfig":
        d = json.loads(s)
        d["stopwords"] = tuple(d.get("stopwords", ()))
        return cls(**d)

    def fingerprint(self) -> str:
        """Stable hash of analyzer+layout config; part of index identity."""
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    def first_pass_k(self, k: int, oversample: float) -> int:
        """Two-pass rescore first-pass size: clamp(k*oversample, 100, 10000).

        Mirrors the clamp logic of `RescoreContext.getFirstPassK`
        (`RescoreContext.java:81-97`).
        """
        return max(self.rescore_min_first_pass_k,
                   min(self.rescore_max_first_pass_k, int(round(k * oversample))))
