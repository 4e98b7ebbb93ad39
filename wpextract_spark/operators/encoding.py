"""Encoding-repair stage: mojibake detection + fix over the text column.

Sits immediately after extraction and before normalization/dedup in the
corpus build — mojibake left in place poisons language ID (the corrupted
chars look like ISO-8859 European text), inflates OOV token rates, and
splits exact-dedup groups that differ only by corruption.

Map-side, shuffle-free, Arrow-batched.  The suspect-pattern regex gate in
the kernel means clean documents (the overwhelming majority) pay one
vectorized regex scan and skip the per-char re-encode entirely.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from wpextract_spark.kernel.mojibake import fix_mojibake

MOJIBAKE_RESULT_TYPE = StructType(
    [
        StructField("fixed", StringType()),
        StructField("changed", BooleanType()),
    ]
)


def fix_mojibake_udf(max_passes: int = 3):
    """(text) -> struct<fixed, changed>; null in, null fields out."""

    def _one(value):
        if value is None:
            return (None, None)
        fixed = fix_mojibake(value, max_passes)
        return (fixed, fixed != value)

    @F.pandas_udf(MOJIBAKE_RESULT_TYPE)
    def _fix(text: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_one(value) for value in text], columns=["fixed", "changed"]
        )

    return _fix
