"""Connected components: convergence past any fixed round count.

Round-2 verdict marked the fixed-6-round propagation as the one weak
component — chain-shaped dup families (diameter > 6) would be silently
mislabeled at scale. These fixtures are exactly those shapes.
"""

from pyspark.sql import functions as F

from martial_arts_ocr_spark.queries.graph import connected_components


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return (
        df.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            df.select(F.col("doc_b").alias("src"),
                      F.col("doc_a").alias("dst"))
        )
    )


def test_chain_deeper_than_six_rounds(spark):
    """A 21-node path (diameter 20) — the fixed-6-round version mislabels
    every node more than 6 hops from the minimum; pointer jumping must
    collapse the whole chain to label 0."""
    pairs = [(i, i + 1) for i in range(20)]
    out = connected_components(_edges(spark, pairs)).collect()
    assert len(out) == 21
    assert all(r["lbl"] == 0 for r in out), sorted(
        (r["doc"], r["lbl"]) for r in out
    )


def test_two_components_and_determinism(spark):
    """Separate components keep separate min labels; a second run returns
    identical labels (determinism invariant)."""
    pairs = [(3, 7), (7, 9), (20, 21), (21, 22), (22, 23)]
    a = sorted((r["doc"], r["lbl"])
               for r in connected_components(_edges(spark, pairs)).collect())
    b = sorted((r["doc"], r["lbl"])
               for r in connected_components(_edges(spark, pairs)).collect())
    assert a == b
    assert a == [(3, 3), (7, 3), (9, 3), (20, 20), (21, 20), (22, 20),
                 (23, 20)]


def test_empty_edges(spark):
    out = connected_components(
        _edges(spark, []).where(F.lit(False))
    ).collect()
    assert out == []


def test_reliable_checkpoint_mode_same_labels(spark, tmp_path):
    """reliable=True (round-5: the executor-loss-safe 100 TB mode) must
    produce identical components to the localCheckpoint default — on a
    chain graph whose diameter exercises several pointer-jump rounds."""
    from martial_arts_ocr_spark.queries.graph import connected_components

    n = 40
    rows = [(i, i + 1) for i in range(n)] + [(100, 101), (200, 200)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    und = edges.union(edges.selectExpr("dst AS src", "src AS dst"))
    local = {(r.doc, r.lbl)
             for r in connected_components(und).collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rel_df = connected_components(und, reliable=True)
    rel = {(r.doc, r.lbl) for r in rel_df.collect()}
    assert rel == local
    # round-5 review find: the reliable path leaked one checkpoint file
    # set per materialization per round; all but the FINAL labels must be
    # deleted (2 materializations/round x ~6 rounds would otherwise
    # remain)
    import os
    rdd_dirs = [os.path.join(dp, d)
                for dp, dns, _ in os.walk(str(tmp_path / "ckpt"))
                for d in dns if d.startswith("rdd-")]
    assert len(rdd_dirs) <= 1, rdd_dirs
    # every chain node labeled 0, the island pair 100, the loner 200
    assert all(lbl == 0 for d, lbl in rel if d <= n)
    assert {lbl for d, lbl in rel if d in (100, 101)} == {100}
    assert (200, 200) in rel


def test_keep_set_survives_later_cluster_builds(spark):
    """Round-7 review repro: the keep-set embeds localCheckpointed CC
    labels; with one shared labels slot, building ANY later
    clusters/funnel frame freed the blocks under a previously returned
    keep-set plan (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on re-execution).
    Per-slot lifetimes: a keep-set frame must survive later
    dedup_clusters AND funnel builds; only the next keep-set build may
    retire it."""
    from martial_arts_ocr_spark.queries.corpus import (
        q_corpus_keep_set,
        q_curation_funnel,
    )
    from martial_arts_ocr_spark.queries.graph import q_dedup_clusters

    sf = "/root/testdata/sf0.001"
    a = q_corpus_keep_set(spark, sf)
    n_a = a.count()
    q_dedup_clusters(spark, sf).count()      # different slot
    q_curation_funnel(spark, sf).count()     # own 'funnel' slot
    assert a.count() == n_a                  # A's storage still alive
