"""Skew-handling operators: salted two-stage aggregation.

A `groupBy(hot_key)` over a skewed domain sends every row of a hot key
to ONE reducer — at 100 TB a 3-value key (e.g. lineitem returnflag)
means 3 working reducers regardless of cluster size. Salting splits
each hot key across ``n_salts`` reducers with a deterministic salt,
partially aggregates, then combines the ``n_salts`` partials per key in
a second (tiny) shuffle. Map-side combine already handles *moderate*
skew; salting is for aggregations whose group-domain is far smaller
than the cluster's parallelism.

Results are identical to the direct aggregation because the partial
aggregates carried between stages are decimal sums and counts — exact
and associative, so the two-stage regrouping cannot change the value
(a double sum would differ in the last ulp between plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    salt_on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Per-``keys`` (exact decimal SUM of ``value``, COUNT(*)), computed
    skew-safely: stage 1 groups on (keys, salt) so each hot key spreads
    over ``n_salts`` reducers; stage 2 combines the partials per key.

    ``salt_on`` must name a column that varies within a group (any
    unique-ish id): the salt is ``xxhash64(salt_on) mod n_salts`` —
    deterministic (no rand(), which would break retries/speculation).

    Output columns: *keys, sum_value (decimal), n (long)."""
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        F.sum(value).alias("_psum"),
        F.count(F.lit(1)).alias("_pn"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias("sum_value"),
        F.sum("_pn").cast("long").alias("n"),
    )
