"""char-bigram LM perplexity filter (round-4 VERDICT item 2): model
derivation determinism, integer-exactness of the bucket thresholds, UDF
vs pure-Python scoring equality, and filter behavior on planted
high-/low-perplexity documents."""

import duckdb
import pytest
from pyspark.sql import functions as F

from martial_arts_ocr_spark.queries.corpus import (
    _LM_DROP_MB,
    _LM_KEEP_MB,
    _lm_model,
    _lm_score_udf,
    lm_cost_table,
    q_lm_perplexity_buckets,
)

SF = "/root/testdata/sf0.001"


def _py_score(text, costs, unk):
    return sum(costs.get(text[i:i + 2], unk) for i in range(len(text) - 1))


def test_cost_table_deterministic_and_total():
    counts = {"ab": 3, "ba": 1, "aa": 2}
    c1, u1 = lm_cost_table(counts)
    c2, u2 = lm_cost_table(dict(reversed(list(counts.items()))))
    assert (c1, u1) == (c2, u2)
    # total on its alphabet: every pair of seen chars is priced
    assert set(c1) == {"aa", "ab", "ba", "bb"}
    # frequent pair is cheaper than unseen-smoothed pair
    assert c1["ab"] < c1["bb"]
    # non-ASCII bigrams are excluded from the alphabet entirely
    c3, _ = lm_cost_table({**counts, "é!": 50})
    assert set(c3) == set(c1)


def test_udf_matches_python_scoring(spark):
    costs, unk = _lm_model(spark, SF)
    d = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id < 60")
    rows = d.select("doc_id", "text",
                    _lm_score_udf(costs, unk)(F.col("text"))
                    .alias("s")).collect()
    for r in rows:
        assert r.s == _py_score(r.text, costs, unk), r.doc_id


def test_unknown_chars_cost_unk(spark):
    costs, unk = _lm_model(spark, SF)
    df = spark.createDataFrame(
        [("日本語テスト",), ("ab",), ("",)], "text string")
    got = [r.s for r in df.select(
        _lm_score_udf(costs, unk)(F.col("text")).alias("s")).collect()]
    assert got[0] == 5 * unk            # every bigram unknown
    assert got[1] == costs["ab"]
    assert got[2] == 0                  # empty text: zero bigrams → keep


def test_buckets_fire_and_are_integer_exact(spark):
    out = q_lm_perplexity_buckets(spark, SF).collect()
    buckets = {r.bucket for r in out}
    assert "keep" in buckets and "drop" in buckets and "flag" in buckets
    for r in out:
        # the bucket is a pure integer predicate — recompute it exactly
        want = ("keep" if r.total_millibits <= r.n_bigrams * _LM_KEEP_MB
                else "drop" if r.total_millibits > r.n_bigrams * _LM_DROP_MB
                else "flag")
        assert r.bucket == want, r.doc_id


def test_planted_gibberish_drops_and_corpus_text_does_not(spark):
    """A doc of rare-transition gibberish scores drop; a doc made of the
    corpus' own common words stays well out of the drop band (the corpus
    salad's transitions are near-uniform, so its docs average ~2460
    millibits — 'keep' is exercised by test_buckets_fire; the separation
    claim here is gibberish vs natural, over 3000 millibits apart)."""
    costs, unk = _lm_model(spark, SF)
    common = "the table value scan part row " * 30
    gibberish = "zqxj wvkq jxqz qzxw " * 40
    s_c = _py_score(common, costs, unk)
    s_g = _py_score(gibberish, costs, unk)
    assert s_c <= (len(common) - 1) * _LM_DROP_MB
    assert s_g > (len(gibberish) - 1) * _LM_DROP_MB
    # and the gap is wide: gibberish costs >2x per bigram
    assert s_g * (len(common) - 1) > 2 * s_c * (len(gibberish) - 1)


def test_udf_matches_python_on_fuzzed_unicode(spark):
    """The UDF scores via a utf-32 code-point view clipped at the 128
    sentinel; the oracle path slices Python strings. Fuzz strings mixing
    ASCII, Latin-1, CJK, and astral-plane emoji (where UTF-16 code-unit
    counting would diverge from code-point counting) and require exact
    agreement — including that Spark's length() (n_bigrams) counts code
    points like Python len()."""
    import random

    costs, unk = _lm_model(spark, SF)
    rng = random.Random(55)
    alphabet = "the scan! é漢字\U0001d11e\U0001f980 5 \n\tqz"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
             for _ in range(300)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text",
        _lm_score_udf(costs, unk)(F.col("text")).alias("s"),
        F.greatest(F.length("text") - 1, F.lit(0)).alias("n"),
    ).collect()
    for r in rows:
        assert r.s == _py_score(r.text, costs, unk), repr(r.text)
        assert r.n == max(len(r.text) - 1, 0), repr(r.text)


def test_degenerate_training_sample_oracle_stays_wellformed():
    """lm_cost_table on counts with no ASCII bigrams yields an empty cost
    table; the oracle builder must still emit runnable SQL whose every
    lookup falls through to unk — mirror of the Spark all-unk matrix."""
    costs, unk = lm_cost_table({"漢字": 5})
    assert costs == {} and unk == 0
    # the VALUES fallback row is 3 chars — prove a join against it can
    # never match a 2-char document bigram
    con = duckdb.connect()
    n = con.execute(
        "SELECT count(*) FROM (VALUES ('###', 0)) m(bg, cost) "
        "WHERE m.bg = 'ab'").fetchone()[0]
    assert n == 0
    con.close()


def test_model_matches_duckdb_trained_counts(spark):
    """Spark-trained counts (explode/groupBy) and a DuckDB/Python count of
    the same sample must produce the identical baked model."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE doc_id < 200"
    ).fetchall()
    con.close()
    counts: dict = {}
    for (t,) in rows:
        for i in range(len(t) - 1):
            counts[t[i:i + 2]] = counts.get(t[i:i + 2], 0) + 1
    assert lm_cost_table(counts) == _lm_model(spark, SF)


# --- per-language models (round-5 VERDICT item 3) -----------------------------

def test_per_lang_scoring_diverges_from_global(spark):
    """Per-lang models must actually change the scores, with the expected
    structure. NOTE on this corpus: the driver documents share ONE word
    vocabulary across lang labels (there is no real distribution shift),
    so a per-lang model's smaller training slice means a smaller
    alphabet/sparser counts and the add-one smoothing penalty DOMINATES —
    per-lang costs come out HIGHER, least so for en (the largest slice,
    ~44% of the sample). The assertable signature is therefore: (a)
    essentially every doc's score moves, and (b) en's mean per-bigram
    penalty is strictly the smallest — i.e. each doc IS being scored by
    its own lang's model, with sample size driving the penalty. On a real
    multilingual corpus the deltas would flip sign for non-en langs; the
    operator is the same either way."""
    from martial_arts_ocr_spark.queries.corpus import (
        _lm_models_by_lang, q_lm_perplexity_by_lang)

    global_rows = {r.doc_id: r.total_millibits
                   for r in q_lm_perplexity_buckets(spark, SF).collect()}
    by_lang = q_lm_perplexity_by_lang(spark, SF).collect()
    assert _lm_models_by_lang(spark, SF).keys() >= {"en", "de", "zh"}
    deltas: dict = {}
    for r in by_lang:
        deltas.setdefault(r.lang, []).append(
            (r.total_millibits - global_rows[r.doc_id])
            / max(r.n_bigrams, 1))
    moved = sum(1 for ds in deltas.values() for d in ds if d != 0)
    assert moved > 0.95 * sum(len(ds) for ds in deltas.values())
    mean = {lg: sum(ds) / len(ds) for lg, ds in deltas.items()}
    assert all(mean["en"] < m for lg, m in mean.items() if lg != "en"), mean


def test_per_lang_changes_at_least_one_bucket(spark):
    """The realism gap the round-5 VERDICT names: under the per-lang
    models at least one document's keep/flag/drop bucket must actually
    change vs the global model (otherwise the operator is a no-op)."""
    from martial_arts_ocr_spark.queries.corpus import q_lm_perplexity_by_lang

    g = {r.doc_id: r.bucket
         for r in q_lm_perplexity_buckets(spark, SF).collect()}
    changed = [(r.doc_id, r.lang, g[r.doc_id], r.bucket)
               for r in q_lm_perplexity_by_lang(spark, SF).collect()
               if r.bucket != g[r.doc_id]]
    assert changed, "per-lang models changed no bucket"


def test_unseen_lang_falls_back_to_global(spark):
    """A lang with no trained model scores under the global matrix —
    exercised directly through the stacked-matrix UDF (driver data has a
    model for every lang, so the fallback can't fire there)."""
    from martial_arts_ocr_spark.queries.corpus import (
        _lm_model, _lm_models_by_lang, _lm_score_by_lang_udf)

    models = _lm_models_by_lang(spark, SF)
    gcosts, gunk = _lm_model(spark, SF)
    assert "xx" not in models
    udf = _lm_score_by_lang_udf(models, gcosts, gunk)
    df = spark.createDataFrame(
        [("xx", "the quick brown fox"), ("en", "the quick brown fox"),
         ("xx", None)],
        "lang string, text string")
    rows = {(r.lang, r.text): r.s
            for r in df.select("lang", "text",
                               udf(F.col("lang"), F.col("text"))
                               .alias("s")).collect()}
    assert rows[("xx", "the quick brown fox")] == _py_score(
        "the quick brown fox", gcosts, gunk)
    en_costs, en_unk = models["en"]
    assert rows[("en", "the quick brown fox")] == _py_score(
        "the quick brown fox", en_costs, en_unk)
    assert rows[("xx", None)] == 0
