"""Randomized property tests for the round-5 pure helpers (no Ray):
the vectorized Levenshtein DP, the wildcard->regex translator, and the
boost parser — each against an obviously-correct Python reference.
"""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_jvector_ray.analyze import (
    parse_boosted_query, wildcard_to_regex,
)
from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import _levenshtein_vec

CFG = EngineConfig()

short_word = st.text(alphabet="abcde", min_size=0, max_size=8)


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (a[i - 1] != b[j - 1]))
    return dp[len(b)]


@settings(max_examples=120, deadline=None)
@given(st.lists(short_word, min_size=1, max_size=20), short_word)
def test_levenshtein_vec_random(cands, q):
    got = _levenshtein_vec(cands, q)
    assert got.tolist() == [_lev_ref(t, q) for t in cands]


def _wild_ref(pat: str, s: str) -> bool:
    """Reference wildcard matcher: recursive, obviously correct."""
    if not pat:
        return not s
    if pat[0] == "*":
        return any(_wild_ref(pat[1:], s[i:]) for i in range(len(s) + 1))
    if not s:
        return False
    if pat[0] == "?" or pat[0] == s[0]:
        return _wild_ref(pat[1:], s[1:])
    return False


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet="ab*?.", min_size=0, max_size=6),
       st.text(alphabet="ab.", min_size=0, max_size=6))
def test_wildcard_to_regex_random(pat, s):
    rx = wildcard_to_regex(pat)
    assert (re.fullmatch(rx, s) is not None) == _wild_ref(pat, s)


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet="abn01.*?+(){}[]|\\^$:ix", min_size=0,
               max_size=10),
       st.text(alphabet="abn01\n\t", min_size=0, max_size=8))
def test_regex_prefilter_never_drops_a_match(pat, s):
    """_regex_prefilter soundness: whenever a string FULLY matches the
    pattern, it must start with the claimed anchored prefix and contain
    every claimed required literal (the prefilter may only shrink the
    candidate set, never the result set)."""
    from opensearch_jvector_ray.query import _regex_prefilter
    try:
        matched = re.fullmatch(pat, s) is not None
    except re.error:
        return                      # invalid pattern: engine rejects too
    if not matched:
        return
    pfx, literals = _regex_prefilter(pat)
    assert s.startswith(pfx), (pat, s, pfx)
    for lit in literals:
        assert lit in s, (pat, s, lit)


def test_regex_prefilter_extraction_examples():
    from opensearch_jvector_ray.query import _regex_prefilter
    pfx, lits = _regex_prefilter("foo.*bar")
    # the prefix run is implied by the range filter, not re-listed
    assert pfx == "foo" and set(lits) == {"bar"}
    assert _regex_prefilter("merge") == ("merge", [])
    assert _regex_prefilter("a|b") == ("", [])
    pfx, lits = _regex_prefilter("(ab)?cd")
    assert pfx == "" and lits == ["cd"]       # group is optional
    pfx, lits = _regex_prefilter("ab{2}cd")
    assert pfx == "a" and "cd" in lits and all("2" not in l
                                               for l in lits)
    assert _regex_prefilter(r"fo\.o")[0] == "fo.o"
    assert _regex_prefilter(r"\d+foo")[0] == ""
    assert "foo" in _regex_prefilter(r"\d+foo")[1]
    # round-4 review regressions: non-literal escapes are OPAQUE (or
    # mapped to their real char), never the following letter
    pfx, lits = _regex_prefilter(r"foo\nbar")
    assert pfx == "foo\nbar" and "foonbar" not in lits
    assert _regex_prefilter(r"foo\x41bar")[0] == "foo"
    assert all("41" not in l and "x" not in l
               for l in _regex_prefilter(r"foo\x41bar")[1])
    assert _regex_prefilter(r"a\012b")[0] == "a"
    assert all("12" not in l for l in _regex_prefilter(r"a\012b")[1])
    assert _regex_prefilter(r"\p{Greek}foo")[0] == ""
    assert all("Greek" not in l
               for l in _regex_prefilter(r"\p{Greek}foo")[1])
    # inline flags poison everything after them -> bail entirely
    assert _regex_prefilter("(?i)foo.*") == ("", [])
    assert _regex_prefilter("foo(?i:bar)") == ("", [])
    assert _regex_prefilter("(?:ab)?cd")[1] == ["cd"]   # plain group ok


def test_prefix_upper_bound_surrogate_gap():
    from opensearch_jvector_ray.query import _prefix_upper_bound
    assert _prefix_upper_bound("ab") == "ac"
    # 0xD7FF + 1 lands in the surrogate gap -> jump to U+E000
    b = _prefix_upper_bound("x" + chr(0xD7FF))
    assert b == "x" + chr(0xE000)
    b.encode("utf-8")               # must be encodable (Arrow filter)
    assert _prefix_upper_bound(chr(0x10FFFF)) is None


def test_expand_fuzzy_empty_term_large_vocab(tmp_path):
    """Regression (round-4 review): the bag-of-chars prefilter crashed
    with IndexError on term='' when candidates exceeded 256 (ucp empty
    -> gather indexes [-1])."""
    import os
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opensearch_jvector_ray.query import (IndexSearcher,
                                              _levenshtein_vec)
    from opensearch_jvector_ray.stages.build import IndexSpec, build_index
    d = _levenshtein_vec(["a", "", "ab"], "")
    assert list(d) == [1, 0, 2]
    # >256 distinct short terms so the >256-candidate branch is live
    # even for the 0..2-char length band around ''
    vocab = [f"{a}{b}" for a in "abcdefghijklmnopqr"
             for b in "abcdefghijklmnopqr"][:300]
    tbl = pa.table({
        "conv_id": pa.array([f"c{i:04d}" for i in range(len(vocab))]),
        "turn_idx": pa.array([0] * len(vocab), type=pa.int32()),
        "text": pa.array(vocab),
        "role": pa.array(["user"] * len(vocab)),
        "ts": pa.array(np.zeros(len(vocab), dtype="datetime64[us]")),
        "tool": pa.array([None] * len(vocab), type=pa.string()),
    })
    idx = str(tmp_path / "fz")
    build_index(rd.from_arrow(tbl), idx, CFG, IndexSpec())
    s = IndexSearcher(idx)
    out = s.expand_fuzzy("", max_edits=2)    # must not raise
    assert all(len(t) <= 2 for t in out)


boost_chunk = st.one_of(
    st.sampled_from(["data", "model", "the", "a1"]),
    st.tuples(st.sampled_from(["data", "model", "x"]),
              st.floats(0, 8, allow_nan=False)).map(
        lambda t: f"{t[0]}^{t[1]!r}"),
)


@settings(max_examples=80, deadline=None)
@given(st.lists(boost_chunk, min_size=0, max_size=8))
def test_parse_boosted_query_random(chunks):
    text = " ".join(chunks)
    got = dict(parse_boosted_query(text, CFG))
    # brute: accumulate boost per analyzed term in appearance order
    exp: dict[str, float] = {}
    for c in chunks:
        if "^" in c:
            stem, _, bs = c.rpartition("^")
            boost = float(bs)
        else:
            stem, boost = c, 1.0
        for t in re.split(r"[^a-z0-9]+", stem.lower()):
            if t and t not in CFG.stopwords:
                exp[t] = exp.get(t, 0.0) + boost
    assert got == exp
    # weights are reproducible (pure function)
    assert parse_boosted_query(text, CFG) == parse_boosted_query(text, CFG)
