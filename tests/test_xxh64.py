"""The pure-Python XXH64 mirror must agree with Spark's xxhash64 —
it bakes bucket-id literals into the run_checkpoints oracle."""

import random
import string

from pyspark.sql import functions as F

from martial_arts_ocr_spark.queries.xxh64 import (spark_pmod_bucket,
                                                  spark_xxhash64_str)


def test_matches_spark_xxhash64(spark):
    rng = random.Random(5)
    strs = [f"h{i}.example.com" for i in range(7)] + [
        "".join(rng.choice(string.printable)
                for _ in range(rng.randint(0, 100)))
        for _ in range(80)
    ] + ["", "a", "é぀" * 20, "x" * 31, "y" * 32, "z" * 33]
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    for row in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert spark_xxhash64_str(row["s"]) == row["h"], repr(row["s"])


def test_bucket_matches_spark_pmod(spark):
    hosts = [f"h{i}.example.com" for i in range(7)]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    rows = df.select(
        "host", F.pmod(F.xxhash64("host"), F.lit(8)).alias("b")
    ).collect()
    for r in rows:
        assert spark_pmod_bucket(r["host"], 8) == r["b"]
