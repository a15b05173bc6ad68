"""Real-BPE tokenizer unit coverage (round-4 VERDICT item 4): training
determinism, encode semantics, the baked-table freshness guard, and the
Spark UDF vs pure-Python mirror equivalence per doc."""

import duckdb

from martial_arts_ocr_spark import bpe


def test_train_deterministic_and_tiebreak():
    texts = ["ab ab ab cd cd", "ab cd"]
    m1 = bpe.train_bpe(texts, 4)
    m2 = bpe.train_bpe(list(texts), 4)
    assert m1 == m2
    # 'ab' (freq 4) beats 'cd' (freq 3); both single-merge words
    assert m1[0] == ("a", "b") and ("c", "d") in m1


def test_train_tie_breaks_lexicographically():
    # 'ba' and 'ab' pairs appear equally often → lexicographically
    # smaller pair ('a','b') merges first
    m = bpe.train_bpe(["ab ba ab ba"], 1)
    assert m == [("a", "b")]


def test_encode_applies_lowest_rank_first():
    # ranks: ('b','c') rank 0, ('a','bc') rank 1, ('a','b') rank 2 —
    # encode must pick bc first, then a+bc, NOT the greedy-leftmost a+b
    ranks = {("b", "c"): 0, ("a", "bc"): 1, ("a", "b"): 2}
    assert bpe.encode_len("abc", ranks) == 1
    # without the composite merge the word stays at 2 symbols
    assert bpe.encode_len("abc", {("b", "c"): 0}) == 2
    # unknown word: no merges apply → one token per char
    assert bpe.encode_len("xyz", ranks) == 3


def test_merge_once_nonoverlapping():
    assert bpe._merge_once(tuple("aaa"), "a", "a") == ("aa", "a")
    assert bpe._merge_once(tuple("aaaa"), "a", "a") == ("aa", "aa")


def test_baked_table_is_current():
    con = duckdb.connect()
    texts = [r[0] for r in con.execute(
        "SELECT text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') ORDER BY doc_id"
    ).fetchall()]
    con.close()
    assert bpe.train_bpe(texts, bpe.N_MERGES) == bpe.BPE_MERGES
    assert len(bpe.BPE_MERGES) == bpe.N_MERGES


def test_doc_count_cache_equivalence():
    ranks = bpe.merge_ranks()
    text = "scan column scan the fast table 42 rows!"
    assert bpe.doc_token_count(text, ranks) == \
        bpe.doc_token_count(text, ranks, cache={})
    # counts are STRICTLY below stage-1 pre-token counts for merged vocab
    import re
    n_pre = len(re.findall(bpe.PRETOKEN_RE, text))
    assert bpe.doc_token_count(text, ranks) < n_pre * 3


def test_spark_udf_matches_mirror_per_doc(spark):
    from pyspark.sql import functions as F

    from martial_arts_ocr_spark.queries.textops import _bpe_count_udf

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet").where("doc_id < 80")
    rows = d.select("doc_id", _bpe_count_udf()(F.col("text"))
                    .alias("n")).collect()
    got = {r.doc_id: r.n for r in rows}
    con = duckdb.connect()
    # the deployed UDF applies the 1,024-merge table (round-6)
    from martial_arts_ocr_spark.bpe_merges_1k import BPE_MERGES_1K
    ranks = bpe.merge_ranks(BPE_MERGES_1K)
    for did, text in con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        f"WHERE doc_id < 80"
    ).fetchall():
        assert got[did] == bpe.doc_token_count(text, ranks), did
    con.close()


def test_encode_properties_on_fuzz_corpora():
    """Properties on random corpora: (1) 1 <= encode_len(w) <= len(w);
    (2) greedy lowest-rank-first encode reproduces the trainer's own
    final segmentation of every training word (the two are equivalent
    because merges fuse symbols and can never create an adjacency of two
    pre-existing symbols — this pins that argument)."""
    import random

    rng = random.Random(99)
    for trial in range(25):
        vocab = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
                 for _ in range(rng.randint(2, 12))]
        corpus = [" ".join(rng.choice(vocab)
                           for _ in range(rng.randint(1, 30)))]
        merges = bpe.train_bpe(corpus, n_merges=rng.randint(1, 20))
        ranks = bpe.merge_ranks(merges)
        # trainer's final state: apply merges in rank order to each word
        for w in set("".join(corpus).split()):
            sym = tuple(w)
            for a, b in merges:
                sym = bpe._merge_once(sym, a, b)
            got = bpe.encode_len(w, ranks)
            assert got == len(sym), (trial, w, merges)
            assert 1 <= got <= len(w)


def test_unknown_ranks_never_merge():
    assert bpe.encode_len("hello", {}) == 5
    assert bpe.doc_token_count("", bpe.merge_ranks()) == 0


# --- the 1,024-merge table (round-5 VERDICT item 5) ---------------------------

def test_1k_table_shape_and_freshness_prefix():
    """The baked 1k table is current: greedy BPE's prefix property (the
    first k merges of an n-merge train equal a k-merge train — the state
    evolution is identical until step k) lets a cheap 64-merge retrain
    pin the generator + the table prefix without the full ~10 s train;
    scripts/regen_bpe_1k.py verifies the full literal."""
    from martial_arts_ocr_spark.bpe_merges_1k import BPE_MERGES_1K

    assert len(BPE_MERGES_1K) == bpe.N_MERGES_1K == 1024
    assert len(set(BPE_MERGES_1K)) == 1024          # no duplicate merges
    prefix = bpe.train_bpe_from_freq(bpe.synth_wfreq(), 64)
    assert prefix == BPE_MERGES_1K[:64]


def test_1k_table_compresses_rich_corpus_better_than_64():
    """On the rich synthetic corpus the 1k table must compress materially
    better than the 64-merge driver-corpus table (which shares no
    vocabulary) — the evidence the extra merges DO something."""
    from martial_arts_ocr_spark.bpe_merges_1k import BPE_MERGES_1K

    docs = bpe.synth_docs(5, words_per_doc=80)
    r64 = bpe.merge_ranks()
    r1k = bpe.merge_ranks(BPE_MERGES_1K)
    n64 = sum(bpe.doc_token_count(t, r64) for t in docs)
    n1k = sum(bpe.doc_token_count(t, r1k) for t in docs)
    assert n1k * 2 < n64, (n1k, n64)


def test_synth_corpus_deterministic():
    assert bpe.synth_word(7) == bpe.synth_word(7)
    d1 = bpe.synth_docs(2, words_per_doc=10)
    d2 = bpe.synth_docs(2, words_per_doc=10)
    assert d1 == d2
    wf = bpe.synth_wfreq(200)
    assert wf == bpe.synth_wfreq(200)
    assert min(wf.values()) >= 2
