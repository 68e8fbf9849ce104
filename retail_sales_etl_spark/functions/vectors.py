"""Vector kernels for embedding columns (array<float>/array<double>).

Two implementations of the same math:

- Catalyst expressions (``dot``, ``cosine``): JVM-side ``zip_with`` +
  ``aggregate`` folds — whole-stage codegen, zero Python transfer.
  Used by the oracle-checked similarity/dedup operators (deterministic
  sequential fold order).
- Arrow-batched Pandas UDF (``cosine_to_query_udf``): numpy dot over
  a whole Arrow batch — wins when scoring against a fixed query at
  high throughput (BLAS beats per-row codegen for wide vectors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine_to_query_udf(query_vec: list[float]):
    """Vectorized cosine against a fixed query vector.

    Returns a Pandas UDF: array column -> double cosine. The whole
    Arrow batch is stacked into one ndarray and pushed through BLAS.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def _cos(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        dots = mat @ q
        norms = np.linalg.norm(mat, axis=1)
        return pd.Series(dots / (norms * qn))

    return _cos
