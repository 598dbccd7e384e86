"""Skew-aware join: key salting for hot keys.

The reference never joins fact x fact (Cassandra's partition key does
the hashing), but at 100 TB our engine does — and a handful of hot
devices/shingles/buckets can stall a shuffle join on one straggler
task. AQE's skew-join splitting (enabled in session.py) handles most
cases at runtime; this helper is the explicit form for joins AQE
cannot split (e.g. when the skewed side must aggregate first, or on
engines/configs without AQE).

Standard construction (public knowledge, e.g. the Spark docs' skew
recipes): the LARGE side gets a deterministic salt in [0, N) derived
from row identity, the SMALL side is replicated N times, and the join
key becomes (key, salt). Equivalence to the unsalted join holds
because every (key, salt) pair on the left meets exactly one replica
on the right.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    salt_from: str | Column,
    n_salts: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` x ``small`` on ``on`` with an ``n_salts``-way
    salt spreading each hot key across tasks.

    ``salt_from`` is a column of the large side used to derive a
    DETERMINISTIC salt (reproducible runs, unlike ``rand()``); pick a
    high-cardinality column such as a row id. The small side is
    replicated ``n_salts``x, so keep it the dimension side.
    """
    salt_col = F.pmod(
        F.xxhash64(F.col(salt_from) if isinstance(salt_from, str) else salt_from),
        F.lit(n_salts),
    ).cast("int")
    left = large.withColumn("__salt", salt_col)
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left.join(right, on + ["__salt"], how)
    return out.drop("__salt")
