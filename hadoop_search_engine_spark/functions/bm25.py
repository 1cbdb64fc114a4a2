"""BM25 scoring math — one formula, NumPy / Spark Column / SQL parity.

The reference engine has no scorer at all (results are returned in
posting-list order, /root/reference/server/src/services/
search.service.js:58-90); per BASELINE.json the new engine ranks with
BM25(k1=1.2, b=0.75). The formula is the Lucene-style variant:

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(t, d)   = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d)   = sum over query terms t of score(t, d)

All implementations compute in float64 with per-(term, doc) partials
summed in ascending term order (oracle) so that score identity — not
just rank identity — is testable; ties are broken by doc_id ascending
everywhere (SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1


def idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def idf_np(N: int, df: np.ndarray) -> np.ndarray:
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


def score_np(
    tf: np.ndarray,
    dl: np.ndarray,
    idf_val: float | np.ndarray,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return idf_val * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf_col(n_docs: Column | int, df: Column) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log(F.lit(1.0) + (n.cast("double") - df + 0.5) / (df + 0.5))


def score_col(
    tf: Column,
    dl: Column,
    idf_value: Column,
    avgdl: Column | float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    tf_d = tf.cast("double")
    return idf_value * (tf_d * (k1 + 1.0)) / (
        tf_d + k1 * (1.0 - b + b * dl.cast("double") / a)
    )


def sql_idf(n_expr: str, df_expr: str) -> str:
    """ANSI-SQL idf fragment (valid in both Spark SQL and DuckDB)."""
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def sql_score(tf_expr: str, dl_expr: str, idf_expr: str, avgdl_expr: str,
              k1: float = BM25_K1, b: float = BM25_B) -> str:
    return (
        f"({idf_expr}) * ({tf_expr} * ({k1} + 1.0)) / "
        f"({tf_expr} + {k1} * (1.0 - {b} + {b} * ({dl_expr}) / ({avgdl_expr})))"
    )
