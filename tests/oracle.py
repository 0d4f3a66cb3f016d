"""Brute-force BM25 oracle — independent implementation for rank-identity.

Plain Python dict/loop implementation (no Arrow, no shared code paths with
the engine except the config constants), mirroring the reference's exact
expected-docIDs+scores test style (`KNNJVectorTests.java:84-103`) and its
brute-force recall oracle
(`scripts/jvector_index_and_search/jvector_utils/recall_measurement.py`).

Semantics contract (identical to engine + DuckDB oracle):
  tokens = lowercase, split on /[^a-z0-9]+/ (ASCII-equivalent of the
  engine's RE2 pattern for the pure-ASCII fixtures), stopwords removed;
  dl = post-stop token count; N = docs with >=1 token; avgdl = sum(dl)/N;
  idf = ln(1+(N-df+0.5)/(df+0.5)); score = sum_t w_t * idf * tf/(tf+k1*(1-b+b*dl/avgdl));
  ties: score desc, then doc key asc.
"""

from __future__ import annotations

import math
import re
from collections import Counter

TOKEN_RE = re.compile(r"[a-z0-9]+")


def analyze(text: str | None, stopwords: frozenset[str]) -> list[str]:
    if not text:
        return []
    return [t for t in TOKEN_RE.findall(text.lower()) if t not in stopwords]


class BruteForceBM25:
    def __init__(self, docs: dict, stopwords, k1: float = 1.2, b: float = 0.75):
        """docs: {key: text} with key orderable (tuple or scalar)."""
        self.k1, self.b = k1, b
        self.stop = frozenset(stopwords)
        self.tokens = {key: analyze(text, self.stop) for key, text in docs.items()}
        self.dl = {k: len(v) for k, v in self.tokens.items()}
        self.tf = {k: Counter(v) for k, v in self.tokens.items()}
        indexed = [k for k, n in self.dl.items() if n > 0]
        self.n = len(indexed)
        self.avgdl = (sum(self.dl[k] for k in indexed) / self.n) if self.n else 1.0
        self.df: Counter = Counter()
        for k in indexed:
            for term in self.tf[k]:
                self.df[term] += 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        if df == 0:
            return 0.0
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score(self, key, query_terms: list[str]) -> float:
        s = 0.0
        dl = self.dl[key]
        for term in query_terms:    # analyzed order — same summation order as engine
            tf = self.tf[key].get(term, 0)
            if tf == 0:
                continue
            idf = self.idf(term)
            s += idf * tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        return s

    def topk(self, query_text: str, k: int,
             allowed=None) -> list[tuple]:
        """[(key, score)] sorted score desc, key asc; only score>0 docs."""
        qterms = analyze(query_text, self.stop)
        hits = []
        for key in self.tokens:
            if allowed is not None and key not in allowed:
                continue
            s = self.score(key, qterms)
            if s > 0.0:
                hits.append((key, s))
        hits.sort(key=lambda e: (-e[1], e[0]))
        return hits[:k]
