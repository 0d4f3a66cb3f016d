"""Analyzer golden tests (SURVEY §5: tokenizer golden outputs)."""

import numpy as np
import pyarrow as pa

from opensearch_jvector_ray.analyze import analyze_query, query_term_weights, tokenize
from opensearch_jvector_ray.config import EngineConfig, UNICODE_SPLIT_PATTERN


CFG = EngineConfig()


def test_golden_tokens_positions_doclen():
    texts = pa.array(["The quick brown Fox, and the fox!", None, "", "a to of",
                      "fox fox fox jumps"])
    ts = tokenize(texts, CFG)
    assert ts.terms.to_pylist() == ["quick", "brown", "fox", "fox",
                                    "fox", "fox", "fox", "jumps"]
    # positions counted BEFORE stopword removal ("the"@0 keeps quick@1)
    assert ts.positions.tolist() == [1, 2, 3, 6, 0, 1, 2, 3]
    assert ts.doc_idx.tolist() == [0, 0, 0, 0, 4, 4, 4, 4]
    # doc_len counts post-stop tokens; null/empty/stop-only docs are 0
    assert ts.doc_len.tolist() == [4, 0, 0, 0, 4]


def test_numbers_and_punctuation():
    ts = tokenize(pa.array(["error-42 at 3.14 o'clock"]), CFG)
    assert ts.terms.to_pylist() == ["error", "42", "3", "14", "o", "clock"]


def test_no_stopwords_config():
    cfg = EngineConfig(stopwords=())
    ts = tokenize(pa.array(["the cat"]), cfg)
    assert ts.terms.to_pylist() == ["the", "cat"]
    assert ts.doc_len.tolist() == [2]


def test_unicode_pattern():
    cfg = EngineConfig(split_pattern=UNICODE_SPLIT_PATTERN)
    ts = tokenize(pa.array(["Café déjà-vu 東京 42"]), cfg)
    assert ts.terms.to_pylist() == ["café", "déjà", "vu", "東京", "42"]


def test_query_analysis_and_weights():
    assert analyze_query("The Fox AND the fox", CFG) == ["fox", "fox"]
    assert query_term_weights("fox dog fox", CFG) == [("fox", 2), ("dog", 1)]


def test_empty_batch():
    ts = tokenize(pa.array([], type=pa.string()), CFG)
    assert len(ts.doc_idx) == 0 and len(ts.doc_len) == 0
