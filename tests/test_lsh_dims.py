"""LSH signature width-independence (round-1 hardcoded 64 and crashed on
any other embedding width) + determinism of the derived hyperplanes."""

import pandas as pd
import pytest

from martial_arts_ocr_spark.queries.similarity import (
    _lsh_planes,
    _lsh_signature_udf,
)


@pytest.mark.parametrize("dim", [8, 32, 64, 100])
def test_lsh_signature_any_width(spark, dim):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.standard_normal(dim)])
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    sig = _lsh_signature_udf()
    out = df.select("vec_id", sig("embedding").alias("bucket")).collect()
    assert len(out) == 20
    assert all(0 <= r.bucket < (1 << 16) for r in out)
    # deterministic across invocations
    out2 = df.select("vec_id", sig("embedding").alias("bucket")).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_lsh_planes_deterministic_per_dim():
    a, b = _lsh_planes(32), _lsh_planes(32)
    assert (a == b).all()
    assert _lsh_planes(8).shape == (16, 8)
