"""Driver-contract audit for ``__spark_entry__``.

The correctness gate checks only the FIRST 50 ``queries()`` entries in
dict order (rounds 2-3 silently lost oracle coverage past the cap) and
its canonicalizer cannot sort/hash array- or map-typed result cells
(round-3: 4 queries errored on list columns). These tests pin the
contract structurally so neither regression can ship again:

* exactly 50 queries, every one with an ``oracle_sql()`` twin;
* every query's OUTPUT schema is flat scalars only (arrays are
  serialized / unpivoted in the result shape, not removed from the
  underlying operators);
* ``entry(spark)`` runs and returns rows with a stable schema.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# the one intentionally oracle-free query would be listed here; today
# every entry has a SQL twin
ORACLE_FREE: set[str] = set()


def test_query_budget_is_exactly_fifty():
    qs = entrymod.queries()
    assert len(qs) == 50, (
        f"queries() has {len(qs)} entries — the driver checks only the "
        "first 50; fold or split to stay at the cap")


def test_every_query_has_an_oracle_twin():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs - os_ == ORACLE_FREE
    assert not (os_ - qs), f"orphan oracle entries: {sorted(os_ - qs)}"


def test_no_query_outputs_nested_columns(spark):
    """Build (don't execute) every query's plan at sf0.001 and assert
    the result schema is scalars only — the driver's pandas-based
    canonicalizer raises ``unhashable type: 'list'`` on any array
    cell."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"nested result columns: {bad}"


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert {"lang", "docs", "pass", "fail"} <= set(df.columns)
    assert df.count() >= 0
