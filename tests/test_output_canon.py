"""Registry-wide output-type canon.

Lesson from the round-6 q26 regression: a query whose RESULT schema
contains a DecimalType can be value-identical to its oracle and still
fail a string-canonicalizing comparator, because Spark renders
Decimal('506627.00') with trailing zeros while the DuckDB→pandas path
yields float 506627.0.  The repo's rule is therefore: decimal
accumulation is an INTERNAL discipline (exact, fold-order-independent
partials); every top-level output column must be double / integral /
string / bool / date / timestamp / array / map / struct-of-those.

The one sanctioned DecimalType surface is the Volume.voxels() uint64 →
decimal(20,0) widening (infos.py VOXEL_SQL_TYPE) — an API convention,
not a registry query output; no registry query emits uint64 voxels, so
the registry ban below is total.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import DataType, DecimalType

from bigarrays_jl_spark.operators import ALL_QUERIES


def _decimal_fields(dt: DataType, path: str = "") -> list[str]:
    """Recurse into arrays/maps/structs so a nested decimal can't hide."""
    hits = []
    if isinstance(dt, DecimalType):
        hits.append(f"{path}: {dt.simpleString()}")
    for child_path, child in _children(dt, path):
        hits.extend(_decimal_fields(child, child_path))
    return hits


def _children(dt: DataType, path: str):
    from pyspark.sql.types import ArrayType, MapType, StructType
    if isinstance(dt, StructType):
        return [(f"{path}.{f.name}", f.dataType) for f in dt.fields]
    if isinstance(dt, ArrayType):
        return [(f"{path}[]", dt.elementType)]
    if isinstance(dt, MapType):
        return [(f"{path}<key>", dt.keyType), (f"{path}<val>", dt.valueType)]
    return []


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_no_decimal_output_columns(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    hits = []
    for field in df.schema.fields:
        hits.extend(_decimal_fields(field.dataType, field.name))
    assert not hits, (
        f"{name} emits decimal-typed output column(s) {hits}; keep decimal "
        "partials internal and project round(cast(x as double), n) at the "
        "top level (q36 pattern) so both engines' client paths format "
        "identically")
