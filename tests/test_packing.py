"""Tokenize-and-pack output stage (packing.py + queries/corpus.py
q_packed_sequences).

Three layers:
* a tiny-corpus golden where the packing arithmetic is recomputed from
  first principles inside the test (independent mini-mirror);
* the real packer's token-id stream invariants (separator structure
  recovers every per-doc token count);
* packer-vs-stats-query agreement on the sf0.001 driver table — the pin
  that ties the oracle-checked query to the artifact-producing surface.
"""

import hashlib

import pytest

from martial_arts_ocr_spark import bpe, packing

SF = "/root/testdata/sf0.001"


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _expected_pack(rows, ctx_len, n_buckets, merges):
    """Independent mini-mirror of the packing arithmetic."""
    ranks = bpe.merge_ranks(merges)
    mids = bpe.merged_token_ids(merges)
    nm = len(merges)
    by_bucket: dict = {}
    for doc_id, text in rows:
        h = hashlib.md5(text.encode()).hexdigest()
        bucket = int(h[:15], 16) % n_buckets
        by_bucket.setdefault(bucket, []).append((h, doc_id, text))
    out = {}
    for bucket, docs in by_bucket.items():
        docs.sort()
        stream = []
        bounds = []
        for h, doc_id, text in docs:
            ids = bpe.doc_token_ids(text, ranks, mids, nm) + [bpe.SEP_ID]
            bounds.append((len(stream), len(stream) + len(ids)))
            stream.extend(ids)
        total = len(stream)
        n_seqs = -(-total // ctx_len)
        for k in range(n_seqs):
            ids = stream[k * ctx_len:(k + 1) * ctx_len]
            n_docs = sum(1 for s, e in bounds
                         if s < (k + 1) * ctx_len and e > k * ctx_len)
            out[(bucket, k)] = (n_docs, len(ids), ids)
    return out


def test_tiny_golden_hand_checked(spark):
    # merges=[] -> every pre-token char is its own token; doc costs are
    # hand-countable: "ab cd"->4+1, "xyz"->3+1, "ab cd"(dup)->5
    rows = [(1, "ab cd"), (2, "xyz"), (3, "ab cd")]
    res = packing.pack_token_sequences(
        _mk_docs(spark, rows), ctx_len=4, n_buckets=1, merges=[]).collect()
    exp = _expected_pack(rows, 4, 1, [])
    assert len(res) == len(exp) == -(-(5 + 4 + 5) // 4)
    for r in res:
        n_docs, n_tok, ids = exp[(r.bucket, r.seq_in_bucket)]
        assert r.n_docs_in_seq == n_docs
        assert r.n_tokens == n_tok == len(r.token_ids)
        assert list(r.token_ids) == ids
        assert r.fill_ratio == n_tok / 4.0
    # duplicate texts share a hash; order within the tie is by doc_id and
    # every emitted value is invariant to it
    assert sum(r.n_tokens for r in res) == 14


def test_doc_boundary_spans_chunks(spark):
    # one 10-char doc at ctx_len=4 spans 3 chunks; each chunk sees 1 doc
    rows = [(7, "abcdefghij")]
    res = sorted(packing.pack_token_sequences(
        _mk_docs(spark, rows), ctx_len=4, n_buckets=2, merges=[]).collect(),
        key=lambda r: r.seq_in_bucket)
    assert [r.n_tokens for r in res] == [4, 4, 3]
    assert [r.n_docs_in_seq for r in res] == [1, 1, 1]
    assert res[-1].token_ids[-1] == bpe.SEP_ID


def test_separator_structure_recovers_doc_counts(spark):
    """Concatenating one bucket's chunks and splitting on SEP_ID must give
    exactly the per-doc BPE token counts, in pack order."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sample = docs.where("doc_id < 60")
    res = packing.pack_token_sequences(sample).collect()
    rows = {(r["doc_id"], r["text"])
            for r in sample.select("doc_id", "text").collect()}
    from martial_arts_ocr_spark.bpe_merges_1k import BPE_MERGES_1K
    ranks = bpe.merge_ranks(BPE_MERGES_1K)
    per_bucket: dict = {}
    for r in sorted(res, key=lambda r: (r.bucket, r.seq_in_bucket)):
        per_bucket.setdefault(r.bucket, []).extend(r.token_ids)
    got_counts = []
    for stream in per_bucket.values():
        assert stream[-1] == bpe.SEP_ID
        seg = []
        for tid in stream:
            if tid == bpe.SEP_ID:
                got_counts.append(len(seg))
                seg = []
            else:
                assert tid > 0
                seg.append(tid)
        assert seg == []          # stream ends exactly at a separator
    exp_counts = [bpe.doc_token_count(t, ranks) for _, t in rows]
    assert sorted(got_counts) == sorted(exp_counts)


def test_packer_matches_registered_stats_query(spark):
    """The applyInPandas packer and the window-algebra stats query are the
    same arithmetic — row-for-row equal on the sf0.001 driver table."""
    from martial_arts_ocr_spark.queries.corpus import (
        _SPLIT_SALT, _SPLIT_TRAIN_PERMILLE, q_packed_sequences)
    from pyspark.sql import functions as F

    stats = [(r.bucket, r.seq_in_bucket, r.n_docs_in_seq, r.n_tokens,
              r.fill_ratio) for r in q_packed_sequences(spark, SF).collect()]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    key = F.concat(F.col("doc_id").cast("string"), F.lit(_SPLIT_SALT))
    bucket = (F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
              .cast("bigint") % 1000)
    kept = docs.where(bucket < _SPLIT_TRAIN_PERMILLE)
    packed = [(r.bucket, r.seq_in_bucket, r.n_docs_in_seq, r.n_tokens,
               r.fill_ratio)
              for r in packing.pack_token_sequences(kept).collect()]
    assert sorted(stats) == sorted(packed)
    assert len(stats) > 10


def test_multimodal_packer_matches_registered_query(spark):
    """Round-8 VERDICT item 4: the multimodal packer's media-ref arrays
    must agree row-for-row with the oracled multimodal_seq_media query
    on the sf0.001 driver table, and every recorded offset must point at
    a MEDIA_PLACEHOLDER_ID inside token_ids (the placeholder-position
    pin)."""
    from martial_arts_ocr_spark.queries.corpus import (
        _SPLIT_SALT, _SPLIT_TRAIN_PERMILLE, q_multimodal_seq_media)
    from pyspark.sql import functions as F

    expected = [(r.bucket, r.seq_in_bucket, r.offset_in_seq, r.media_id)
                for r in q_multimodal_seq_media(spark, SF).collect()]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    key = F.concat(F.col("doc_id").cast("string"), F.lit(_SPLIT_SALT))
    split_b = (F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
               .cast("bigint") % 1000)
    kept = docs.where(split_b < _SPLIT_TRAIN_PERMILLE)
    res = packing.pack_multimodal_sequences(kept).collect()
    got = []
    for r in res:
        assert len(r.media_ids) == len(r.media_offsets)
        for mid, off in zip(r.media_ids, r.media_offsets):
            assert r.token_ids[off] == packing.MEDIA_PLACEHOLDER_ID, \
                (r.bucket, r.seq_in_bucket, off)
            got.append((r.bucket, r.seq_in_bucket, off, mid))
    assert sorted(got) == sorted(expected)
    assert len(got) > 100          # one ref per kept doc
    # exactly one placeholder per document overall
    n_kept = kept.count()
    assert len(got) == n_kept
    # the text-token stream is unchanged apart from the placeholders:
    # stripping them recovers the text packer's total token mass + 1/doc
    text_total = sum(r.n_tokens for r in
                     packing.pack_token_sequences(kept).collect())
    mm_total = sum(r.n_tokens for r in res)
    assert mm_total == text_total + n_kept


def test_multimodal_placeholder_position_rule(spark):
    """Tiny golden: with merges=[], doc 3 ("ab cd") has 4 token ids and
    the placeholder lands at 3 % 5 = 3 — hand-checkable stream layout,
    including a ref that lands in the second chunk."""
    rows = [(3, "ab cd")]
    res = sorted(packing.pack_multimodal_sequences(
        _mk_docs(spark, rows), ctx_len=4, n_buckets=1, merges=[]).collect(),
        key=lambda r: r.seq_in_bucket)
    # stream: [a, b, c, MEDIA at pos 3 -> wait for ordered ids] ...
    ranks = bpe.merge_ranks([])
    mids = bpe.merged_token_ids([])
    ids = bpe.doc_token_ids("ab cd", ranks, mids, 0)
    pos = packing.media_insert_pos(3, len(ids))
    ids.insert(pos, packing.MEDIA_PLACEHOLDER_ID)
    ids.append(bpe.SEP_ID)
    stream = ids
    got_stream = [t for r in res for t in r.token_ids]
    assert got_stream == stream
    refs = [(r.seq_in_bucket, o, m) for r in res
            for o, m in zip(r.media_offsets, r.media_ids)]
    assert refs == [(pos // 4, pos % 4, 3)]


def test_rehearsal_n_buckets_64(spark):
    """The 100×-scale rehearsal (r6 VERDICT item 8): n_buckets=64 ≫ the
    session's shuffle parallelism on the sf0.1 table. Pins (a) stats
    query and real packer still agree row-for-row at the scaled knob,
    (b) all 64 buckets are populated (the cumsum window has 64
    independent partitions to parallelize over), and (c) the plan's
    window exchange hash-partitions by bucket — no single-partition
    cumsum appears at any knob setting."""
    from martial_arts_ocr_spark.queries.corpus import (
        _SPLIT_SALT, _SPLIT_TRAIN_PERMILLE, packed_stats_frame)
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.1"
    stats_df = packed_stats_frame(spark, sf, n_buckets=64)
    plan = stats_df._sc._jvm.PythonSQLUtils.explainString(
        stats_df._jdf.queryExecution(), "formatted")
    assert "SinglePartition" not in plan
    assert "hashpartitioning(bucket" in plan, plan[:1500]
    stats = [(r.bucket, r.seq_in_bucket, r.n_docs_in_seq, r.n_tokens,
              r.fill_ratio) for r in stats_df.collect()]
    assert len({b for b, *_ in stats}) == 64
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    key = F.concat(F.col("doc_id").cast("string"), F.lit(_SPLIT_SALT))
    bucket = (F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
              .cast("bigint") % 1000)
    kept = docs.where(bucket < _SPLIT_TRAIN_PERMILLE)
    packed = [(r.bucket, r.seq_in_bucket, r.n_docs_in_seq, r.n_tokens,
               r.fill_ratio)
              for r in packing.pack_token_sequences(
                  kept, n_buckets=64).collect()]
    assert sorted(stats) == sorted(packed)


def test_epoch_order_is_a_per_shard_permutation(spark):
    """packed_epoch_order emits, per (epoch, bucket), a contiguous
    1..n rank over exactly the bucket's sequences — and the two epochs'
    permutations actually differ (the md5 key mixes the epoch)."""
    from martial_arts_ocr_spark.queries.corpus import (
        q_packed_epoch_order,
        q_packed_sequences,
    )

    sf = "/root/testdata/sf0.001"
    seqs = {}
    for r in q_packed_sequences(spark, sf).collect():
        seqs.setdefault(r["bucket"], set()).add(r["seq_in_bucket"])
    by_shard = {}
    for r in q_packed_epoch_order(spark, sf).collect():
        by_shard.setdefault((r["epoch"], r["bucket"]), []).append(
            (r["pos_in_bucket"], r["seq_in_bucket"]))
    assert {b for _, b in by_shard} == set(seqs)
    for (epoch, bucket), rows in by_shard.items():
        rows.sort()
        assert [p for p, _ in rows] == list(range(1, len(rows) + 1))
        assert {s for _, s in rows} == seqs[bucket], (epoch, bucket)
    orders = [
        [s for _, s in sorted(by_shard[(e, b)])]
        for e in (0, 1)
        for b in sorted(seqs)
    ]
    half = len(orders) // 2
    assert orders[:half] != orders[half:], "epoch permutations identical"
