"""Guard the driver-contract surface of every ``queries()`` entry.

The driver canonicalizes each query result with pandas
``DataFrame.sort_values`` over *all* columns before value-hashing; a
cell holding a Python list/dict (i.e. a Spark ``array``/``map``/
``struct`` column) makes pandas ``factorize`` raise
``TypeError: unhashable type: 'list'`` — exactly how ``media_features``
went red at the round-1 driver while passing the local repr-based
check. These tests enforce, for all contract queries at once and
without executing a single job (schema inspection is lazy):

  1. every output column is a scalar type the driver can sort/hash;
  2. every query has an oracle (or is on the documented rows-only
     allowlist), and naming is consistent between the two dicts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry

SCALAR = (
    T.StringType, T.BooleanType, T.DateType, T.TimestampType,
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

# Queries deliberately shipped without a DuckDB oracle (the driver
# records a weaker rows-only check; keep this list short and documented
# at each query's docstring).
ROWS_ONLY_OK: set[str] = set()


def _queries():
    return sorted(entry.queries().items())


@pytest.mark.parametrize("name,fn", _queries(), ids=lambda p: p if isinstance(p, str) else "")
def test_output_schema_is_driver_hashable(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    bad = [
        f.name for f in df.schema.fields
        if not isinstance(f.dataType, SCALAR)
    ]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} — the driver's pandas "
        f"sort_values canonicalizer cannot hash array/map/struct cells "
        f"(round-1 media_features regression class)"
    )


def test_every_query_has_oracle_or_allowlisted():
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    missing = qs - os_ - ROWS_ONLY_OK
    assert not missing, f"queries without oracle_sql: {sorted(missing)}"
    orphans = os_ - qs
    assert not orphans, f"oracle_sql without queries: {sorted(orphans)}"


def test_oracle_column_names_align(spark, sf_dir):
    """Driver compare sorts columns by NAME before hashing — a name
    mismatch between Spark output and oracle SQL is an automatic red row
    even with identical values. Cheap static screen: every Spark output
    column name must appear in the oracle SQL text (as an alias or bare
    column)."""
    oracles = entry.oracle_sql()
    problems = []
    for name, fn in entry.queries().items():
        sql = oracles.get(name)
        if sql is None:
            continue
        df = fn(spark, sf_dir)
        low = sql.lower()
        for c in df.columns:
            if c.lower() not in low:
                problems.append(f"{name}: column {c!r} absent from oracle SQL")
    assert not problems, "\n".join(problems)
