"""BM25 scoring math — single source of truth.

score(q, d) = Σ_{t ∈ q∩d} idf(t) · tnorm(tf, dl)
  idf(t)        = ln(1 + (N − df + 0.5) / (df + 0.5))      (Lucene variant)
  tnorm(tf, dl) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

k1=1.2, b=0.75 per the north star. All math in float64. The same two
functions exist as Spark Column expressions (JVM, whole-stage codegen),
numpy (segment/WAND path), and plain Python (oracle) — rank-identity
between paths is a tested invariant, with ties broken (score desc,
doc_id asc) for determinism.

Note tnorm is df-independent: block-max metadata stores max tnorm per
block, and idf is applied at query time from *current* global df — so
incremental segment merges never invalidate block metadata.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from mee_spark.config import B, K1


def idf_col(df_col: Column, n_docs: int | Column) -> Column:
    """``n_docs`` may be a driver scalar or a Column (round 7): passing
    the corpus-stats aggregate in-plan (broadcast 1-row cross join) lets
    a caller skip the separate stats collect() action; the float ops are
    identical either way, so scores are bit-identical."""
    nd = n_docs if isinstance(n_docs, Column) else F.lit(float(n_docs))
    return F.log(1.0 + (nd - df_col + 0.5) / (df_col + 0.5))


def tnorm_col(tf_col: Column, dl_col: Column, avgdl: float | Column,
              k1: float = K1, b: float = B) -> Column:
    ad = avgdl if isinstance(avgdl, Column) else F.lit(float(avgdl))
    denom = tf_col + k1 * (1.0 - b + b * dl_col / ad)
    return tf_col * (k1 + 1.0) / denom


def idf_np(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))


def tnorm_np(tf: np.ndarray, dl: np.ndarray, avgdl: float,
             k1: float = K1, b: float = B) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tnorm_py(tf: int, dl: int, avgdl: float,
             k1: float = K1, b: float = B) -> float:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
