"""Every registered query must emit scalar-only columns.

The driver's correctness gate canonicalizes results with pandas
``sort_values`` over all columns; an ArrayType/StructType/MapType output
column raises ``TypeError: unhashable type`` there (round-1's only red
row, ``minhash_bands``). This guard keeps the whole surface scalar so the
class of failure cannot reappear."""

from pyspark.sql import types as T

from martial_arts_ocr_spark.queries import ALL_QUERIES

SF = "/root/testdata/sf0.001"

_FORBIDDEN = (T.ArrayType, T.StructType, T.MapType)


def test_all_query_outputs_are_scalar(spark):
    offenders = []
    for name, fn in sorted(ALL_QUERIES.items()):
        schema = fn(spark, SF).schema
        for field in schema.fields:
            if isinstance(field.dataType, _FORBIDDEN):
                offenders.append((name, field.name,
                                  field.dataType.simpleString()))
    assert not offenders, offenders
