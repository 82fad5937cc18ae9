"""BM25 scoring shared by the distributed engine and the exact oracle.

Rank-identity contract (SURVEY.md §7 hard part 1): the engine and the oracle
must produce bit-identical float64 scores. Achieved by:

- ``idf`` computed as a per-term Python scalar with ``math.log`` in both paths
  (numpy's SIMD log is not guaranteed ulp-identical to libm);
- tf normalization using only IEEE +,*,/ (identical elementwise in numpy and
  scalar Python);
- per-doc accumulation strictly in canonical term order — ascending
  ``(df, lemma)`` (rarest-lemma-first, the reference's O1 ordering
  ``SearchServiceImpl.java:112``, with the lemma string as deterministic
  tie-break the reference lacks).

The reference's ranking is a plain tf-sum normalized by the max
(``SearchServiceImpl.java:141-161``); ``tf_sum`` mode reproduces that for
parity, while ``bm25`` is the north-star default.
"""

from __future__ import annotations

import math

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(n_docs: int, df: int) -> float:
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm_vec(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """Vectorized tf component: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))."""
    tfs = tfs.astype(np.float64)
    dls = dls.astype(np.float64)
    return (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * (dls / avgdl)))


def tf_norm_scalar(tf: float, dl: float, avgdl: float, k1: float, b: float) -> float:
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def canonical_term_order(lemma_dfs: dict[str, int]) -> list[str]:
    """Ascending (df, lemma): rarest first, deterministic tie-break."""
    return sorted(lemma_dfs, key=lambda l: (lemma_dfs[l], l))
