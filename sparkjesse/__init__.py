"""sparkjesse — a PySpark-native JSON-Schema + dataset-constraint
validation engine with the query capabilities of klarna/jesse (reference:
/root/reference, Apache-2.0), re-designed Spark-first.

Public API (equivalents of /root/reference/src/jesse.erl:49-178):

* ``validate_value(schema, value, ...)`` — local single-value fast path
  (drives the JSON-Schema-Test-Suite conformance corpus).
* ``SchemaRegistry`` — add/read/delete/load_dir schema registry.
* ``ValidationEngine`` — DataFrame-scale validation: Catalyst-compiled
  predicates for typed columns, Arrow-batched pandas UDFs for dynamic JSON.
* ``sparkjesse.dataset_checks`` — column stats, HLL cardinality,
  uniqueness, referential integrity, KS/PSI drift.
"""

from __future__ import annotations

from .errors import (  # noqa: F401
    DRAFT3,
    DRAFT4,
    SchemaNotFound,
    Violation,
)
from .pyvalidator import is_valid, validate_value  # noqa: F401
from .registry import SchemaRegistry  # noqa: F401

try:  # DataFrame engine — needs pyspark; the local kernel does not
    from .engine import ValidationEngine, ValidationResult  # noqa: F401
except ImportError:  # pragma: no cover
    ValidationEngine = None  # type: ignore[assignment]
    ValidationResult = None  # type: ignore[assignment]

__version__ = "0.1.0"

__all__ = [
    "DRAFT3",
    "DRAFT4",
    "SchemaNotFound",
    "SchemaRegistry",
    "ValidationEngine",
    "ValidationResult",
    "Violation",
    "is_valid",
    "validate_value",
]
