"""Timestamp-type-tolerant time arithmetic.

Spark 4 reads untagged parquet ``timestamp[us]`` as ``TIMESTAMP_NTZ``
when ``spark.sql.parquet.inferTimestampNTZ.enabled`` is on (the
default), and ``unix_micros`` rejects NTZ at analysis time. The source
layer normalizes (``sources/tables.py``), but operators should not
depend on every caller having gone through it: ``ts_micros`` accepts
either timestamp flavor. With the session timezone pinned to UTC the
NTZ→TIMESTAMP cast is bit-exact, and for a column that is already
TIMESTAMP the cast is a no-op Catalyst folds away.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Microseconds since the epoch, tolerant of TIMESTAMP_NTZ input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
