"""End-to-end resumable curation runner (engine/curate.py): single-shot
vs crash/resume byte-equality, batch-size invariance, and the config
pin."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _packed_content(spark, root):
    from martial_arts_ocr_spark.engine.curate import read_packed

    rows = read_packed(spark, root).collect()
    return sorted(
        (r["bucket"], r["seq_in_bucket"], r["n_docs_in_seq"],
         r["n_tokens"], tuple(r["token_ids"]))
        for r in rows
    )


@pytest.fixture(scope="module")
def single_shot(spark, tmp_path_factory):
    from martial_arts_ocr_spark.engine.curate import run_curate

    root = str(tmp_path_factory.mktemp("wh_single"))
    summary = run_curate(spark, SF, root, "run-a", batch_size=4)
    return root, summary


def test_single_shot_completes_and_matches_direct_pack(spark, single_shot):
    from martial_arts_ocr_spark.packing import pack_token_sequences
    from martial_arts_ocr_spark.queries.corpus import q_corpus_keep_set

    root, summary = single_shot
    assert summary["complete"]
    assert summary["buckets_completed"] == 8
    assert summary["n_seqs"] > 0 and summary["n_tokens"] > 0

    flags = q_corpus_keep_set(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = docs.join(flags.where(F.col("kept")).select("doc_id"), "doc_id")
    direct = sorted(
        (r["bucket"], r["seq_in_bucket"], r["n_docs_in_seq"],
         r["n_tokens"], tuple(r["token_ids"]))
        for r in pack_token_sequences(kept).collect()
    )
    assert _packed_content(spark, root) == direct


def test_crash_then_resume_is_byte_identical(spark, tmp_path, single_shot):
    from martial_arts_ocr_spark.engine.curate import (
        completed_pack_buckets,
        run_curate,
    )

    ref_root, _ = single_shot
    root = str(tmp_path / "wh_resume")
    partial = run_curate(spark, SF, root, "run-b", batch_size=4, max_waves=1)
    assert not partial["complete"]
    assert partial["buckets_completed"] == 4
    done_before = completed_pack_buckets(spark, root, "run-b")

    resumed = run_curate(spark, SF, root, "run-b", batch_size=4)
    assert resumed["complete"]
    # resume did not redo finished buckets' checkpoints under a new wave 0
    assert done_before <= completed_pack_buckets(spark, root, "run-b")
    assert _packed_content(spark, root) == _packed_content(spark, ref_root)


def test_batch_size_does_not_shape_output(spark, tmp_path, single_shot):
    from martial_arts_ocr_spark.engine.curate import run_curate

    ref_root, _ = single_shot
    root = str(tmp_path / "wh_b3")
    summary = run_curate(spark, SF, root, "run-c", batch_size=3)
    assert summary["complete"]
    assert _packed_content(spark, root) == _packed_content(spark, ref_root)


def test_wave_reads_only_its_own_buckets(spark, single_shot):
    """The round-6 scale flag (VERDICT What's wrong #1): each pack wave
    must touch ONLY its buckets' files — the kept table is materialized
    bucket-partitioned once, and the wave reader lists only its
    ``bucket=K`` dirs. Assert via inputFiles against the wave set, and
    that the full bucket range is covered by the union of wave reads."""
    import re

    from martial_arts_ocr_spark.engine.curate import read_kept_buckets

    root, _ = single_shot
    seen_buckets = set()
    for wave in ([0, 1, 2, 3], [4, 5, 6, 7]):
        files = read_kept_buckets(spark, root, "run-a", wave).inputFiles()
        assert files, wave                    # sf0.001 fills every bucket
        for f in files:
            m = re.search(r"/bucket=(\d+)/", f)
            assert m, f
            assert int(m.group(1)) in wave, (f, wave)
            seen_buckets.add(int(m.group(1)))
    assert seen_buckets == set(range(8))


def test_kept_table_row_count_matches_keep_set(spark, single_shot):
    from martial_arts_ocr_spark.engine.curate import read_kept_buckets
    from martial_arts_ocr_spark.queries.corpus import q_corpus_keep_set

    root, _ = single_shot
    n_kept = q_corpus_keep_set(spark, SF).where(F.col("kept")).count()
    assert read_kept_buckets(
        spark, root, "run-a", list(range(8))).count() == n_kept


def _epoch_content(spark, root, run_id, n_epochs=2):
    from martial_arts_ocr_spark.engine.curate import read_epoch_order

    out = []
    for e in range(n_epochs):
        rows = read_epoch_order(spark, root, run_id, e).collect()
        out.extend((r["epoch"], r["bucket"], r["pos_in_bucket"],
                    r["seq_in_bucket"], r["shuffle_key"]) for r in rows)
    return sorted(out)


def test_epoch_artifact_matches_shared_derivation(spark, single_shot):
    """Stage 3 materializes the training reader's shard/order table; it
    must equal epoch_order_frame over the packed table (the exact
    definition the oracled packed_epoch_order query pins), and each
    (epoch, bucket) shard must be a complete 1..n permutation."""
    from collections import defaultdict

    from martial_arts_ocr_spark.engine.curate import read_packed
    from martial_arts_ocr_spark.packing import epoch_order_frame

    root, summary = single_shot
    assert summary["epochs_complete"]
    assert summary["epochs_completed"] == 2
    got = _epoch_content(spark, root, "run-a")
    direct = sorted(
        (r["epoch"], r["bucket"], r["pos_in_bucket"],
         r["seq_in_bucket"], r["shuffle_key"])
        for r in epoch_order_frame(
            read_packed(spark, root).select("bucket", "seq_in_bucket"), 2
        ).collect()
    )
    assert got == direct and got
    shards = defaultdict(list)
    for epoch, bucket, pos, _seq, _key in got:
        shards[(epoch, bucket)].append(pos)
    for key, poss in shards.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), key


def test_epoch_crash_then_resume_is_byte_identical(spark, tmp_path,
                                                   single_shot):
    from martial_arts_ocr_spark.engine.curate import (
        completed_epochs,
        run_curate,
    )

    ref_root, _ = single_shot
    root = str(tmp_path / "wh_epoch_resume")
    partial = run_curate(spark, SF, root, "run-ep", batch_size=8,
                         max_epochs=1)
    assert partial["complete"] and not partial["epochs_complete"]
    assert completed_epochs(root, "run-ep") == {0}

    resumed = run_curate(spark, SF, root, "run-ep", batch_size=8)
    assert resumed["epochs_complete"]
    assert completed_epochs(root, "run-ep") == {0, 1}
    assert _epoch_content(spark, root, "run-ep") == \
        _epoch_content(spark, ref_root, "run-a")


def test_config_pin_refuses_drifted_resume(spark, tmp_path):
    from martial_arts_ocr_spark.engine.curate import run_curate

    root = str(tmp_path / "wh_pin")
    run_curate(spark, SF, root, "run-d", batch_size=4, max_waves=1)
    with pytest.raises(ValueError, match="different curation config"):
        run_curate(spark, SF, root, "run-d", ctx_len=256)


def test_second_run_id_refused_over_same_warehouse(spark, tmp_path):
    from martial_arts_ocr_spark.engine.curate import run_curate

    root = str(tmp_path / "wh_two_runs")
    run_curate(spark, SF, root, "run-e", batch_size=8, max_waves=1)
    with pytest.raises(ValueError, match="already holds curation state"):
        run_curate(spark, SF, root, "run-f")


def test_second_run_id_refused_even_before_first_snapshot(spark, tmp_path):
    """ADVICE r6: a run that crashes between its bucket-dir moves and the
    snapshot append leaves orphan bucket dirs with NO snapshot — the guard
    must key on the config pin (written before any data) too, or a new
    run_id silently mixes the dead run's orphans into its output."""
    import json
    import os

    from martial_arts_ocr_spark.engine.curate import run_curate

    root = str(tmp_path / "wh_orphan")
    os.makedirs(root)
    with open(os.path.join(root, "_curate_dead-run.json"), "w") as f:
        json.dump({"n_buckets": 8, "ctx_len": 512, "n_merges": 1024}, f)
    with pytest.raises(ValueError, match="dead-run"):
        run_curate(spark, SF, root, "run-g", max_waves=1)


def test_resume_survives_checkpoint_dir_with_no_committed_files(spark,
                                                                tmp_path):
    """ADVICE r6: a crash during the very first checkpoint append leaves
    packed_checkpoints/ holding only Spark's _temporary subdir — resume
    must treat that as 'nothing completed', not die on schema inference."""
    import os

    from martial_arts_ocr_spark.engine.curate import (
        PACKED_CKPT_TABLE,
        completed_pack_buckets,
    )
    from martial_arts_ocr_spark.engine import catalog

    root = str(tmp_path / "wh_crash_ckpt")
    ckpt_dir = catalog.table_path(root, PACKED_CKPT_TABLE)
    os.makedirs(os.path.join(ckpt_dir, "_temporary", "0"))
    assert completed_pack_buckets(spark, root, "run-h") == set()


def test_epoch_stream_is_packed_sequences_permuted(spark, single_shot):
    """The reader surface: epoch 0's stream must contain EXACTLY the
    packed sequences (same token arrays), each tagged with its shard
    position, and within every shard the pos order must be the epoch-0
    permutation — i.e. a reader walking (bucket, pos) consumes every
    training sequence exactly once in shuffled order."""
    from martial_arts_ocr_spark.engine.curate import (
        read_epoch_stream,
        read_packed,
    )

    root, _ = single_shot
    stream = read_epoch_stream(spark, root, "run-a", epoch=0).collect()
    packed = read_packed(spark, root).collect()
    assert len(stream) == len(packed) > 0
    assert (
        sorted((r["bucket"], r["seq_in_bucket"], tuple(r["token_ids"]))
               for r in stream)
        == sorted((r["bucket"], r["seq_in_bucket"], tuple(r["token_ids"]))
                  for r in packed)
    )
    by_shard = {}
    for r in stream:
        by_shard.setdefault(r["bucket"], []).append(
            (r["pos_in_bucket"], r["seq_in_bucket"]))
    for bucket, rows in by_shard.items():
        rows.sort()
        assert [p for p, _ in rows] == list(range(1, len(rows) + 1)), bucket
        # the permutation is real: identity order would mean the epoch
        # key never mixed (vanishingly unlikely above a few sequences)
        if len(rows) > 4:
            assert [s for _, s in rows] != sorted(s for _, s in rows), bucket
