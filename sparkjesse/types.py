"""Shared Spark type definitions for the engine."""

from __future__ import annotations

from pyspark.sql.types import ArrayType, StringType, StructField, StructType

VIOLATION_FIELDS = [
    "error_kind", "error_type", "path", "schema_ptr", "value_json", "detail",
]

VIOLATION_TYPE = StructType([
    StructField(name, StringType(), True) for name in VIOLATION_FIELDS
])

VIOLATIONS_ARRAY_TYPE = ArrayType(VIOLATION_TYPE, False)
