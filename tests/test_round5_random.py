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
@given(st.text(alphabet="ab01.*?+(){}[]|\\^$", min_size=0, max_size=10),
       st.text(alphabet="ab01", min_size=0, max_size=8))
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
    assert pfx == "foo" and set(lits) == {"foo", "bar"}
    assert _regex_prefilter("merge") == ("merge", ["merge"])
    assert _regex_prefilter("a|b") == ("", [])
    pfx, lits = _regex_prefilter("(ab)?cd")
    assert pfx == "" and lits == ["cd"]       # group is optional
    pfx, lits = _regex_prefilter("ab{2}cd")
    assert pfx == "a" and "cd" in lits and all("2" not in l
                                               for l in lits)
    assert _regex_prefilter(r"fo\.o")[0] == "fo.o"
    assert _regex_prefilter(r"\d+foo")[0] == ""
    assert "foo" in _regex_prefilter(r"\d+foo")[1]


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
