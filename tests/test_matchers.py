"""Exhaustive value-match operator table — the port of the reference's
``test/astarte_data_updater_plant/value_match_operators_test.exs``
(operator x type x nil combinations), asserted against BOTH the
pure-Python matcher and the compiled Spark Column expression so the
in-stream (volatile trigger) and join-side (trigger dimension)
evaluators can never drift apart.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
)

from astarte_data_updater_plant_spark.functions.matchers import (
    py_value_match,
    value_match,
)

# (op, value, known, expected) — the reference's truth table
# (value_match_operators_test.exs; ANY :21, nil guards :24-26,
# comparisons :28-50, CONTAINS/NOT_CONTAINS :52-74).
CASES = [
    # ANY matches everything, including nil
    ("ANY", 42.0, None, True),
    ("ANY", None, None, True),
    ("ANY", "x", "y", True),
    # EQUAL_TO
    ("EQUAL_TO", 42.0, 42.0, True),
    ("EQUAL_TO", 42.0, 41.0, False),
    ("EQUAL_TO", "abc", "abc", True),
    ("EQUAL_TO", "abc", "abd", False),
    ("EQUAL_TO", True, True, True),
    ("EQUAL_TO", None, 42.0, False),
    ("EQUAL_TO", 42.0, None, False),
    # NOT_EQUAL_TO
    ("NOT_EQUAL_TO", 42.0, 41.0, True),
    ("NOT_EQUAL_TO", 42.0, 42.0, False),
    ("NOT_EQUAL_TO", None, 42.0, False),
    # GREATER_THAN
    ("GREATER_THAN", 43.0, 42.0, True),
    ("GREATER_THAN", 42.0, 42.0, False),
    ("GREATER_THAN", 41.0, 42.0, False),
    ("GREATER_THAN", None, 42.0, False),
    # GREATER_OR_EQUAL_TO
    ("GREATER_OR_EQUAL_TO", 42.0, 42.0, True),
    ("GREATER_OR_EQUAL_TO", 43.0, 42.0, True),
    ("GREATER_OR_EQUAL_TO", 41.0, 42.0, False),
    ("GREATER_OR_EQUAL_TO", None, 42.0, False),
    # LESS_THAN
    ("LESS_THAN", 41.0, 42.0, True),
    ("LESS_THAN", 42.0, 42.0, False),
    ("LESS_THAN", None, 42.0, False),
    # LESS_OR_EQUAL_TO
    ("LESS_OR_EQUAL_TO", 42.0, 42.0, True),
    ("LESS_OR_EQUAL_TO", 41.0, 42.0, True),
    ("LESS_OR_EQUAL_TO", 43.0, 42.0, False),
    ("LESS_OR_EQUAL_TO", None, 42.0, False),
    # CONTAINS / NOT_CONTAINS on strings (substring semantics)
    ("CONTAINS", "hello world", "world", True),
    ("CONTAINS", "hello world", "mars", False),
    ("CONTAINS", None, "world", False),
    ("NOT_CONTAINS", "hello world", "mars", True),
    ("NOT_CONTAINS", "hello world", "world", False),
    ("NOT_CONTAINS", None, "mars", False),
]

ARRAY_CASES = [
    # CONTAINS / NOT_CONTAINS on arrays (membership semantics)
    ("CONTAINS", [1.0, 2.0, 3.0], 2.0, True),
    ("CONTAINS", [1.0, 2.0, 3.0], 4.0, False),
    ("CONTAINS", None, 2.0, False),
    ("NOT_CONTAINS", [1.0, 2.0, 3.0], 4.0, True),
    ("NOT_CONTAINS", [1.0, 2.0, 3.0], 2.0, False),
]


@pytest.mark.parametrize("op,value,known,expected", CASES)
def test_python_matcher(op, value, known, expected):
    assert py_value_match(op, value, known) is expected


@pytest.mark.parametrize("op,value,known,expected", ARRAY_CASES)
def test_python_matcher_arrays(op, value, known, expected):
    assert py_value_match(op, value, known) is expected


def _spark_eval(spark, rows, value_type, known_type):
    """Evaluate value_match for a batch of cases in ONE Spark job."""
    df = spark.createDataFrame(
        [(i, op, v, k) for i, (op, v, k, _e) in enumerate(rows)],
        schema=(
            "id long, op string, value "
            + value_type
            + ", known "
            + known_type
        ),
    )
    out = {}
    vt = ArrayType(DoubleType()) if value_type.startswith("array") else None
    for op in {r[0] for r in rows}:
        part = df.filter(F.col("op") == op).withColumn(
            "got", value_match(op, F.col("value"), F.col("known"), vt)
        )
        for r in part.collect():
            out[r.id] = r.got
    return out


def test_spark_matcher_matches_python_numeric(spark):
    rows = [c for c in CASES if not isinstance(c[1], (str, bool)) or c[1] is None]
    rows = [
        (op, v, k, e)
        for op, v, k, e in rows
        if (v is None or isinstance(v, float)) and (k is None or isinstance(k, float))
    ]
    got = _spark_eval(spark, rows, "double", "double")
    for i, (op, v, k, expected) in enumerate(rows):
        assert got[i] is expected, (op, v, k)


def test_spark_matcher_matches_python_string(spark):
    rows = [
        (op, v, k, e)
        for op, v, k, e in CASES
        if (isinstance(v, str) or v is None) and isinstance(k, str)
    ]
    got = _spark_eval(spark, rows, "string", "string")
    for i, (op, v, k, expected) in enumerate(rows):
        assert got[i] is expected, (op, v, k)


def test_spark_matcher_matches_python_array(spark):
    got = _spark_eval(spark, ARRAY_CASES, "array<double>", "double")
    for i, (op, v, k, expected) in enumerate(ARRAY_CASES):
        assert got[i] is expected, (op, v, k)
