"""Join helpers for scale: salted equi-join for skewed keys.

AQE's skew-join splitting (enabled in :mod:`plda_spark.session`) handles
most skew at runtime; explicit salting remains the tool when a single
hot key exceeds what AQE can split (e.g. one key owning 30% of a 100 TB
fact table) or when AQE is unavailable (streaming joins).

``salted_join`` produces results identical to a plain inner equi-join
(verified against the DuckDB oracle) while spreading each hot key over
``salt`` shuffle partitions: the big side gets a random salt in
[0, salt), the small side is exploded ``salt``× so every (key, salt)
bucket finds its match.  Cost: small side inflates by ``salt``; use for
genuinely skewed keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join on ``on`` with the shuffle key salted ``salt`` ways.

    Result equals ``big.join(small, on)`` row-for-row; only the physical
    key distribution changes.
    """
    big_s = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, [on, "__salt"]).drop("__salt")
