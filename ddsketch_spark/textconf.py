"""Shared constants for the text-analysis / dedup / similarity operators.

Single source of truth consumed by BOTH the Spark implementations
(operators/textops.py, operators/similarity.py) and the DuckDB oracle
generators (oracles.py) so the two sides can never drift.

All derived parameters (minhash coefficients, hyperplane weights,
quantization scale) are deterministic integers so every pipeline output is
exactly reproducible across engines.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- shingles
SHINGLE_K = 8              # character shingles

# ---------------------------------------------------------------- minhash
MINHASH_H = 16             # signature length
LSH_BANDS = 4              # bands x rows = H
LSH_ROWS = MINHASH_H // LSH_BANDS
_P61 = (1 << 61) - 1       # Mersenne prime modulus
_P31 = (1 << 31) - 1       # shingle-hash reduction (keeps products < 2^61)


def _mix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


# (a_j, b_j) for h_j(s) = (a_j * s + b_j) mod P61, s < 2^31, a_j < 2^30 odd
MINHASH_AB = [((_mix64(2 * j) % (1 << 30)) | 1, _mix64(2 * j + 1) % _P61)
              for j in range(MINHASH_H)]

# ---------------------------------------------------------------- simhash
SIMHASH_BITS = 32

# ---------------------------------------------------------------- language ID
# per-language stopword lists; scores are occurrence counts of ' w ' in the
# padded text. Tie-break: lexicographically smallest language.
LANGID_STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist"],
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
LANGID_LANGS = sorted(LANGID_STOPWORDS)  # evaluation (and tie-break) order

# quality score weights: w_alpha * alpha_ratio + w_stop * stopword_ratio
# + w_nodigit * (1 - digit_ratio) + w_space * space_ratio, rounded to 6 dp
QUALITY_STOPWORDS = ["the", "and", "of", "to", "a"]
QUALITY_WEIGHTS = (0.4, 0.3, 0.2, 0.1)

# ---------------------------------------------------------------- embeddings
EMB_SCALE = 1_000_000      # quantization: q = round(double(x) * EMB_SCALE)
EMB_DIM = 64

# random-hyperplane LSH for cosine ANN: integer weights in [-1000, 1000].
# 6 planes = 64 buckets — sized so the sf0.01 corpus (500 vectors) yields
# ~8 candidates per bucket; a 10^9-vector corpus would use 16-24 planes
# (bucket count should track corpus size / desired candidate-set size).
ANN_PLANES = 6


def ann_plane_weights() -> np.ndarray:
    """(ANN_PLANES, EMB_DIM) deterministic integer hyperplane weights."""
    w = np.empty((ANN_PLANES, EMB_DIM), dtype=np.int64)
    for p in range(ANN_PLANES):
        for d in range(EMB_DIM):
            w[p, d] = _mix64(p * EMB_DIM + d + 7) % 2001 - 1000
    return w
