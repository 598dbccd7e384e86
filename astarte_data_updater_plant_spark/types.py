"""Astarte value type system <-> Spark SQL types.

The reference stores every value in exactly one of 14 typed columns
chosen by the endpoint's ``value_type`` enum (reference:
``queries.ex:139,178`` via CQLUtils.type_to_db_column_name; the column
set is declared in ``test/support/database_test_helper.exs:195-208``
and ``:224-237``). This module is the single source of truth for that
mapping on the Spark side.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import types as T


class ValueType(str, Enum):
    """The closed set of Astarte mapping value types (SURVEY §1.2)."""

    DOUBLE = "double"
    INTEGER = "integer"
    LONGINTEGER = "longinteger"
    STRING = "string"
    BOOLEAN = "boolean"
    BINARYBLOB = "binaryblob"
    DATETIME = "datetime"
    DOUBLEARRAY = "doublearray"
    INTEGERARRAY = "integerarray"
    LONGINTEGERARRAY = "longintegerarray"
    STRINGARRAY = "stringarray"
    BOOLEANARRAY = "booleanarray"
    BINARYBLOBARRAY = "binaryblobarray"
    DATETIMEARRAY = "datetimearray"

    @property
    def is_array(self) -> bool:
        return self.value.endswith("array")

    @property
    def scalar(self) -> "ValueType":
        return ValueType(self.value[: -len("array")]) if self.is_array else self


_SCALAR_SPARK: dict[ValueType, T.DataType] = {
    ValueType.DOUBLE: T.DoubleType(),
    ValueType.INTEGER: T.IntegerType(),
    ValueType.LONGINTEGER: T.LongType(),
    ValueType.STRING: T.StringType(),
    ValueType.BOOLEAN: T.BooleanType(),
    ValueType.BINARYBLOB: T.BinaryType(),
    ValueType.DATETIME: T.TimestampType(),
}


def spark_type(vt: ValueType) -> T.DataType:
    """Spark type for a value type (arrays of the scalar for *array)."""
    base = _SCALAR_SPARK[vt.scalar]
    return T.ArrayType(base) if vt.is_array else base


def db_column_name(vt: ValueType) -> str:
    """Typed storage column, mirroring CQLUtils.type_to_db_column_name
    (e.g. 'double' -> 'double_value', 'doublearray' ->
    'doublearray_value')."""
    return f"{vt.value}_value"


#: All 14 typed columns in declaration order (database_test_helper.exs
#: :195-208): scalars first, then arrays.
TYPED_COLUMNS: tuple[tuple[str, T.DataType], ...] = tuple(
    (db_column_name(vt), spark_type(vt)) for vt in ValueType
)


@dataclass(frozen=True)
class TypedValue:
    """A value routed to its storage column."""

    value_type: ValueType
    column: str

    @classmethod
    def of(cls, vt: ValueType) -> "TypedValue":
        return cls(value_type=vt, column=db_column_name(vt))


def python_value_type(value: object) -> ValueType | None:
    """Classify a decoded payload value (BSON-ish Python object) into
    the Astarte type that stores it, following the decode rules of
    ``payloads_decoder.ex:29-62`` (bool before int: bool is an int
    subclass in Python).
    """
    import datetime

    if isinstance(value, bool):
        return ValueType.BOOLEAN
    if isinstance(value, float):
        return ValueType.DOUBLE
    if isinstance(value, int):
        # BSON distinguishes int32/int64; Python ints collapse — use
        # the int32 range boundary like the wire format does.
        return ValueType.INTEGER if -(2**31) <= value < 2**31 else ValueType.LONGINTEGER
    if isinstance(value, str):
        return ValueType.STRING
    if isinstance(value, (bytes, bytearray)):
        return ValueType.BINARYBLOB
    if isinstance(value, datetime.datetime):
        return ValueType.DATETIME
    if isinstance(value, list) and value:
        inner = python_value_type(value[0])
        if inner is not None and not inner.is_array:
            return ValueType(inner.value + "array")
    return None
