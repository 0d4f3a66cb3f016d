"""Scalar scoring kernels: BM25 + the reference's vector-distance surface.

BM25 [Lucene public semantics — the postings/similarity delegate the
reference rides on, delegation at `KNN10010Codec.java:39-41,100`]:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

with k1=1.2, b=0.75 (Lucene BM25Similarity form — note no (k1+1)
numerator, as in Lucene 8+), N = docs containing the field, avgdl =
sum(dl)/N.  All math float64; the DuckDB oracle reproduces this formula
symbol-for-symbol.

Vector kernels mirror the script-scoring surface of the reference
(`plugin/script/KNNScoringUtil.java`: l2Squared :98, cosinesimil :137,
l1Norm :215, lInfNorm :233, innerProduct :251, hamming :179-202) and the
score translations of `SpaceType.java:29-161` (L2 -> 1/(1+d), cosine ->
(2-raw)/2 i.e. (1+cos)/2, etc.).  All are batch kernels: ``vecs`` is an
(n, d) float array, ``q`` a (d,) query.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def bm25_idf(n_docs: float, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_part(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                 k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def quantize_doc_len(dl: np.ndarray, mantissa_bits: int = 3) -> np.ndarray:
    """Lossy doc-length quantization for the approximate first pass.

    The analog of Lucene's one-byte SmallFloat norm (and, structurally, of
    the reference's PQ-approximate first pass before exact rerank,
    `JVectorReader.java:154-166`): values are rounded down to a float with
    ``mantissa_bits`` mantissa bits, so long docs quantize coarsely.
    """
    dl = np.maximum(np.asarray(dl, dtype=np.int64), 1)
    m, e = np.frexp(dl.astype(np.float64))            # dl = m * 2^e, m in [0.5, 1)
    steps = np.floor(m * (1 << (mantissa_bits + 1)))  # 2^mb .. 2^(mb+1)-1
    out = steps * np.exp2(e - mantissa_bits - 1)
    return out.astype(np.int64)


# ---------------------------------------------------------------------------
# Vector kernels (KNNScoringUtil.java analogs), batched
# ---------------------------------------------------------------------------

def l2_squared(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    d = vecs - q[None, :]
    return np.einsum("ij,ij->i", d, d)


def inner_product(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    return vecs @ q


def cosine_similarity(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """cosinesimilOptimized analog: query norm hoisted out of the loop
    (`KNNScoringUtil.java:156`)."""
    qn = np.linalg.norm(q)
    vn = np.linalg.norm(vecs, axis=1)
    denom = np.where(vn * qn == 0.0, 1.0, vn * qn)
    return (vecs @ q) / denom


def l1_norm(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    return np.abs(vecs - q[None, :]).sum(axis=1)


def linf_norm(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    return np.abs(vecs - q[None, :]).max(axis=1)


def hamming(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Bit-level hamming over uint8 rows (`calculateHammingBit`,
    `KNNScoringUtil.java:179-202`)."""
    x = np.bitwise_xor(vecs.astype(np.uint8), q.astype(np.uint8)[None, :])
    return np.unpackbits(x, axis=1).sum(axis=1)


# --- Lucene-ordering score translations (SpaceType.java:43-161) -----------

def l2_score(dist_sq: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + dist_sq)


def cosine_score(raw_cos: np.ndarray) -> np.ndarray:
    return (1.0 + raw_cos) / 2.0


def inner_product_score(ip: np.ndarray) -> np.ndarray:
    return np.where(ip >= 0, ip + 1.0, 1.0 / (1.0 - ip))


def l1_score(d: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + d)


def linf_score(d: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + d)


def hamming_score(d: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + d)


# --- byte (int8) vector data type (VectorDataType.java:31-84) -------------

def validate_byte_vector(vecs: np.ndarray) -> np.ndarray:
    """The reference's byte-range validator
    (`KNNValidationUtil.validateByteVectorValue`): every element must be a
    WHOLE number within [-128, 127].  Returns the input as float64 (int8
    values are exactly representable, so the shared kernels stay exact)."""
    arr = np.asarray(vecs, dtype=np.float64)
    if not np.isfinite(arr).all() or (arr != np.floor(arr)).any():
        raise ValueError(
            "byte vector values must be whole numbers "
            "(KNNValidationUtil.validateByteVectorValue)")
    if (arr < -128).any() or (arr > 127).any():
        raise ValueError("byte vector values must be within [-128, 127] "
                         "(KNNValidationUtil.validateByteVectorValue)")
    return arr


# --- radial distance <-> score translation (KNNEngine.java:100-192) -------

def distance_to_min_score(metric: str, max_distance: float) -> float:
    """Per-space translation of a radial ``max_distance`` threshold into
    the equivalent Lucene-ordered ``min_score`` (the reference accepts
    either form, `KNNQueryBuilder.java:438-472`;
    `KNNEngine.distanceToRadialThreshold` / `SpaceType` translations).
    Distances use each space's raw convention: squared-L2 for l2, 1-cos
    for cosine, -ip for innerproduct, raw for l1/linf/hamming."""
    if metric == "l2":
        return float(l2_score(np.float64(max_distance)))
    if metric == "cosine":
        return float((2.0 - max_distance) / 2.0)
    if metric == "innerproduct":
        return float(inner_product_score(np.float64(-max_distance)))
    if metric in ("l1", "linf", "hamming"):
        return float(1.0 / (1.0 + max_distance))
    raise ValueError(f"unknown metric {metric!r}")
