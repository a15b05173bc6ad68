"""Skew evidence: salting measurably reduces partition-size imbalance.

The straggler partition bounds wall-clock; this test quantifies max/mean
partition size with (a) no salting, (b) fixed salting, (c) proportional
salting — proportional must be at least as balanced as none, and the hot
host's raw key must disappear."""

from pyspark.sql import functions as F

from martial_arts_ocr_spark.engine.job import (
    detect_hot_host_shares,
    proportional_salt_buckets,
    with_host,
    with_salted_key,
)
from martial_arts_ocr_spark.fixtures.gen_pages import HOT_HOST, pages_pandas

N = 1200
PARTS = 16


def _imbalance(spark, pages, hot):
    df = with_salted_key(pages, hot).repartition(PARTS, F.col("part_key"))
    sizes = df.rdd.glom().map(len).collect()
    nonzero = [s for s in sizes if s]
    return max(sizes) / (sum(sizes) / len(nonzero))


def test_proportional_salting_reduces_straggler(spark):
    pages = with_host(spark.createDataFrame(pages_pandas(N))).persist()
    shares = detect_hot_host_shares(pages, threshold=0.2, sample_fraction=1.0)
    assert HOT_HOST in shares and shares[HOT_HOST] > 0.25

    none = _imbalance(spark, pages, None)
    prop = _imbalance(
        spark, pages,
        proportional_salt_buckets(shares, target_share=1.0 / (4 * PARTS)),
    )
    # unsalted: the hot host (~30% of rows) lands in ONE partition →
    # straggler ≥ ~4x mean at 16 partitions; proportional salting must
    # bring it well down
    assert none > 2.5, none
    assert prop < none / 2, (none, prop)
    # residual key-collision variance (~200 keys over 16 partitions) keeps
    # max/mean ≈ 1.8-2.0; the hot-host-driven 4-6x straggler must be gone
    assert prop < 2.2, prop

    # raw hot key must not exist under salting
    keys = [
        r.part_key for r in
        with_salted_key(pages, proportional_salt_buckets(shares, 0.01))
        .select("part_key").distinct().collect()
    ]
    assert HOT_HOST not in keys
    pages.unpersist()


def test_hot_host_metrics_balance(spark, tmp_path):
    """Machine-checked §7.4 invariant via the lineage metrics table: a
    checkpointed run over the 30%-hot corpus with PROPORTIONAL salting
    (target share 1/(16·buckets) → many keys per bucket, so balls-into-
    bins variance stays low) must keep max bucket docs / mean ≤ 2, and
    must beat the unsalted run's straggler."""
    from martial_arts_ocr_spark.engine import catalog, resume
    from martial_arts_ocr_spark.queries.extraction import (
        _pages_from_documents,
    )

    nb = 8
    pages = _pages_from_documents(
        spark, "/root/testdata/sf0.001", hot_host=True
    ).select("url", "html", "lang")
    df = with_host(pages).persist()
    shares = detect_hot_host_shares(df, threshold=0.05, sample_fraction=1.0)
    buckets = proportional_salt_buckets(shares, target_share=1.0 / (16 * nb))

    def imbalance(root, hot):
        resume.run_checkpointed(spark, df, str(root), run_id="skew",
                                n_buckets=nb, batch_size=nb, hot_hosts=hot)
        m = catalog.read_table(spark, str(root), resume.METRICS_TABLE)
        sizes = [r["n_docs"] for r in m.collect()]
        return max(sizes) / (sum(sizes) / len(sizes))

    salted = imbalance(tmp_path / "salted", buckets)
    unsalted = imbalance(tmp_path / "raw", None)
    df.unpersist()
    assert salted <= 2.0, salted
    assert salted < unsalted, (salted, unsalted)
