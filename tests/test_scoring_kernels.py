"""Scalar kernel tests (§2.8: the KNNScoringUtil surface + translations
from SpaceType.java, and the BM25 pieces)."""

import math

import numpy as np

from opensearch_jvector_ray.functions import scoring as S


RNG = np.random.default_rng(42)
VECS = RNG.standard_normal((50, 17))
Q = RNG.standard_normal(17)


def test_l2_squared_matches_naive():
    exp = [sum((v[i] - Q[i]) ** 2 for i in range(17)) for v in VECS]
    np.testing.assert_allclose(S.l2_squared(VECS, Q), exp, rtol=1e-12)


def test_cosine_matches_naive():
    exp = [float(np.dot(v, Q) / (np.linalg.norm(v) * np.linalg.norm(Q)))
           for v in VECS]
    np.testing.assert_allclose(S.cosine_similarity(VECS, Q), exp, rtol=1e-12)


def test_inner_l1_linf():
    np.testing.assert_allclose(S.inner_product(VECS, Q), VECS @ Q)
    np.testing.assert_allclose(S.l1_norm(VECS, Q),
                               np.abs(VECS - Q).sum(axis=1))
    np.testing.assert_allclose(S.linf_norm(VECS, Q),
                               np.abs(VECS - Q).max(axis=1))


def test_hamming_bitcount():
    a = np.array([[0b10110010, 0b00000001]], dtype=np.uint8)
    q = np.array([0b10010010, 0b00000011], dtype=np.uint8)
    assert S.hamming(a, q)[0] == 1 + 1


def test_score_translations():
    """Lucene-ordering translations (SpaceType.java:43-161): higher score
    == closer, and the exact formulas."""
    d = np.array([0.0, 1.0, 3.0])
    np.testing.assert_allclose(S.l2_score(d), [1.0, 0.5, 0.25])
    np.testing.assert_allclose(S.cosine_score(np.array([-1.0, 0.0, 1.0])),
                               [0.0, 0.5, 1.0])
    ip = np.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(S.inner_product_score(ip), [0.5, 1.0, 3.0])
    assert (np.diff(S.l1_score(np.sort(d))) <= 0).all()


def test_bm25_idf_formula():
    # df=N -> small positive; df=1, N large -> ~ln(N)
    assert S.bm25_idf(100.0, 100.0) == math.log(1 + 0.5 / 100.5)
    assert abs(S.bm25_idf(1000.0, 1.0) - math.log(1 + 999.5 / 1.5)) < 1e-12


def test_bm25_tf_part_monotonicity():
    tf = np.array([1.0, 2.0, 4.0, 8.0])
    part = S.bm25_tf_part(tf, np.full(4, 10.0), avgdl=10.0)
    assert (np.diff(part) > 0).all() and (part < 1.0).all()
    # longer doc -> lower tf part at equal tf
    short = S.bm25_tf_part(np.array([2.0]), np.array([5.0]), avgdl=10.0)
    long_ = S.bm25_tf_part(np.array([2.0]), np.array([50.0]), avgdl=10.0)
    assert short[0] > long_[0]


def test_quantize_doc_len_properties():
    dl = np.arange(1, 5000)
    q = S.quantize_doc_len(dl)
    assert (q <= dl).all()                      # rounds down (lossy floor)
    assert (q >= dl // 2).all()                 # within one octave
    assert (np.diff(q) >= 0).all()              # monotone
    # small values exact (like SmallFloat's exact small-int range)
    np.testing.assert_array_equal(q[:8], dl[:8])
