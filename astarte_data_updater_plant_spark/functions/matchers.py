"""Trigger predicate compiler.

Re-expresses the reference's value-match operator set
(``value_match_operators.ex:20-75``) as Catalyst Column expressions so
trigger evaluation stays JVM-side and codegen'd — no Python in the hot
path. Semantics preserved:

- ``ANY`` matches everything, including null values.
- Every other operator is false when either side is null (the
  reference guards with explicit nil clauses; SQL three-valued logic
  collapses to the same result under a WHERE/JOIN condition).
- ``CONTAINS``/``NOT_CONTAINS`` work on strings (substring) and arrays
  (membership), like the Elixir String.contains?/Enum.member? pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

OPERATORS = (
    "ANY",
    "EQUAL_TO",
    "NOT_EQUAL_TO",
    "GREATER_THAN",
    "GREATER_OR_EQUAL_TO",
    "LESS_THAN",
    "LESS_OR_EQUAL_TO",
    "CONTAINS",
    "NOT_CONTAINS",
)


def _contains(value: Column, known: Column, value_type=None) -> Column:
    if value_type is not None and isinstance(value_type, ArrayType):
        return F.array_contains(value, known)
    return value.contains(known)


def value_match(op: str, value: Column, known: Column, value_type=None) -> Column:
    """Compile one (operator, value, known_value) predicate to a Column.

    Reference: value_match_operators.ex:20-75 — ANY at :21, nil guards
    at :24-26, comparison ops :28-50, CONTAINS/NOT_CONTAINS :52-74.
    """
    if op == "ANY":
        return F.lit(True)
    if op == "EQUAL_TO":
        cond = value == known
    elif op == "NOT_EQUAL_TO":
        cond = value != known
    elif op == "GREATER_THAN":
        cond = value > known
    elif op == "GREATER_OR_EQUAL_TO":
        cond = value >= known
    elif op == "LESS_THAN":
        cond = value < known
    elif op == "LESS_OR_EQUAL_TO":
        cond = value <= known
    elif op == "CONTAINS":
        cond = _contains(value, known, value_type)
    elif op == "NOT_CONTAINS":
        cond = ~_contains(value, known, value_type)
    else:
        raise ValueError(f"unknown value match operator: {op}")
    # nil-guard (value_match_operators.ex:24-26): null on either side -> no match
    return F.coalesce(cond, F.lit(False))


def value_match_any_op(op_col: Column, value: Column, known: Column) -> Column:
    """Data-driven form: the operator itself is a column (trigger table
    broadcast-joined to the stream), compiled to one CASE expression."""
    return (
        F.when(op_col == "ANY", F.lit(True))
        .when(op_col == "EQUAL_TO", F.coalesce(value == known, F.lit(False)))
        .when(op_col == "NOT_EQUAL_TO", F.coalesce(value != known, F.lit(False)))
        .when(op_col == "GREATER_THAN", F.coalesce(value > known, F.lit(False)))
        .when(op_col == "GREATER_OR_EQUAL_TO", F.coalesce(value >= known, F.lit(False)))
        .when(op_col == "LESS_THAN", F.coalesce(value < known, F.lit(False)))
        .when(op_col == "LESS_OR_EQUAL_TO", F.coalesce(value <= known, F.lit(False)))
        .otherwise(F.lit(False))
    )


def py_value_match(op: str, value, known) -> bool:
    """Pure-Python twin of :func:`value_match` for the per-device state
    machine (volatile triggers evaluate in-stream, not as a join).

    Mirrors value_match_operators.ex:20-75 exactly: ANY matches
    everything (:21); any other operator is False when either side is
    nil (:24-26); CONTAINS is substring on strings and membership on
    lists (:52-74); comparisons on mismatched types are False, like the
    reference's rescue clauses.
    """
    if op == "ANY":
        return True
    if value is None or known is None:
        return False
    try:
        if op == "EQUAL_TO":
            return bool(value == known)
        if op == "NOT_EQUAL_TO":
            return bool(value != known)
        if op == "GREATER_THAN":
            return bool(value > known)
        if op == "GREATER_OR_EQUAL_TO":
            return bool(value >= known)
        if op == "LESS_THAN":
            return bool(value < known)
        if op == "LESS_OR_EQUAL_TO":
            return bool(value <= known)
        if op == "CONTAINS":
            return known in value
        if op == "NOT_CONTAINS":
            return known not in value
    except TypeError:
        return False
    raise ValueError(f"unknown value match operator: {op}")
