"""Registry-wide output-schema guard: no DecimalType anywhere.

The r5 driver red row (``text_quality_score``) was a DECIMAL-vs-DOUBLE
*type* divergence: bare numeric literals like ``0.25``/``1.0`` in a
SELECT list parse as DECIMAL in BOTH Spark and DuckDB, the values agree
exactly, so every value-level parity checker passes — but the driver's
raw cross-engine hash serializes the two engines' decimals differently
and stays red forever.  That class is provably invisible to value-level
comparison, so it must be caught at the schema layer: this test binds
every registered query on BOTH engines at sf0.001 and asserts no
DECIMAL-typed column (recursively, through arrays/structs/maps) appears
in any output schema.

Rule for authors: numeric literals that reach an output column must be
DOUBLE-typed — write ``0.25e0`` / ``1e0`` or wrap in
``CAST(... AS DOUBLE)`` (see functions/textquality.py quality column).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _spark_has_decimal(dt) -> bool:
    from pyspark.sql.types import (
        ArrayType,
        DecimalType,
        MapType,
        StructType,
    )

    if isinstance(dt, DecimalType):
        return True
    if isinstance(dt, ArrayType):
        return _spark_has_decimal(dt.elementType)
    if isinstance(dt, MapType):
        return _spark_has_decimal(dt.keyType) or _spark_has_decimal(dt.valueType)
    if isinstance(dt, StructType):
        return any(_spark_has_decimal(f.dataType) for f in dt.fields)
    return False


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_no_decimal_output_spark(name, spark):
    df = QUERIES[name](spark, SF_SMALL)
    offenders = [
        f.name for f in df.schema.fields if _spark_has_decimal(f.dataType)
    ]
    assert not offenders, (
        f"{name}: DECIMAL-typed output column(s) {offenders} — decimal "
        "outputs hash differently across engines even when values agree; "
        "use e0 literals or CAST(... AS DOUBLE)"
    )


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_no_decimal_output_duckdb(name, duck):
    rows = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    offenders = [
        (col, typ) for col, typ, *_ in rows if "DECIMAL" in typ.upper()
    ]
    assert not offenders, (
        f"{name}: DECIMAL-typed oracle column(s) {offenders} — decimal "
        "outputs hash differently across engines even when values agree; "
        "use e0 literals or CAST(... AS DOUBLE)"
    )
