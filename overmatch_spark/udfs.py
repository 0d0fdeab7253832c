"""The engine's Arrow-vectorized UDFs — the ONLY Python that runs on
executors. Everything else is Catalyst expressions (see
overmatch_spark.expressions)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def indel_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """rapidfuzz ``fuzz.ratio(a, b) / 100`` — the reference's
    name-similarity join condition (J4/F19,
    /root/reference/scripts/match.py:242). Arrow-batched, vectorized
    across the batch (kernels.text)."""
    from overmatch_spark.kernels.text import indel_similarity

    return pd.Series(
        indel_similarity(a.fillna("").tolist(), b.fillna("").tolist())
    )
