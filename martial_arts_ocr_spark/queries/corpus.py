"""Corpus-curation operators: the named LLM-training-data pipeline steps
beyond dedup/sketching (similarity.py, neardup.py) and text stats
(textops.py). All oracle-exact.

* ``gopher_quality_flags`` — the public Gopher document-quality rule set
  (Rae et al. 2021, §A1.1): word-count bounds, mean-word-length bounds,
  alphabetic-word fraction, required-stopword hits. Pure column algebra;
  at 100 TB this is a map-only filter fused into the scan.
* ``train_val_split`` — deterministic content-hash split (md5-based, no
  RNG): every engine and every rerun assigns the same doc to the same
  split, the property that makes a split reproducible across a fleet.
* ``benchmark_contamination`` — decontamination: overlap of document
  8-grams with a benchmark probe set, the step that keeps eval data out
  of training corpora. Shuffle on the gram hash; semi-join shape (the
  benchmark side is tiny → broadcast at scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MWL = 3.0
_GOPHER_MAX_MWL = 10.0
_GOPHER_MIN_ALPHA_FRAC = 0.80
_GOPHER_STOPWORDS = ("the", "and", "of", "to", "a")
_GOPHER_MIN_STOP_HITS = 2

_SPLIT_TRAIN_PERMILLE = 900    # 90/10 split on md5(doc_id || salt) % 1000
_SPLIT_SALT = "split-v1"
_CONTAM_K = 8                  # same fixed-k shingles as repeated_spans


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_gopher_quality_flags(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(toks)
    # mean word length = non-whitespace chars / words (exact, no rounding:
    # only the derived booleans are emitted)
    non_ws = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    mwl = non_ws / n_words
    alpha_frac = (
        F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))) / n_words
    )
    stop_hits = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(*_GOPHER_STOPWORDS))
    )
    flags = {
        "words_ok": (n_words >= _GOPHER_MIN_WORDS)
        & (n_words <= _GOPHER_MAX_WORDS),
        "mwl_ok": (mwl >= _GOPHER_MIN_MWL) & (mwl <= _GOPHER_MAX_MWL),
        "alpha_ok": alpha_frac >= _GOPHER_MIN_ALPHA_FRAC,
        "stopwords_ok": stop_hits >= _GOPHER_MIN_STOP_HITS,
    }
    passed = flags["words_ok"] & flags["mwl_ok"] & flags["alpha_ok"] \
        & flags["stopwords_ok"]
    return (
        d.select(
            "doc_id",
            *[v.alias(k) for k, v in flags.items()],
            passed.alias("gopher_pass"),
        )
        .orderBy("doc_id")
    )


ORACLE_GOPHER = f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS ts,
         length(regexp_replace(text, '\\s+', '', 'g')) AS non_ws
  FROM documents
),
f AS (
  SELECT doc_id,
         len(ts) AS n_words,
         CAST(non_ws AS DOUBLE) / len(ts) AS mwl,
         CAST(len(list_filter(ts, w -> regexp_matches(w, '[A-Za-z]')))
              AS DOUBLE) / len(ts) AS alpha_frac,
         len(list_filter(ts, w -> lower(w) IN
             {str(tuple(_GOPHER_STOPWORDS))})) AS stop_hits
  FROM t
)
SELECT doc_id,
       (n_words >= {_GOPHER_MIN_WORDS} AND n_words <= {_GOPHER_MAX_WORDS})
         AS words_ok,
       (mwl >= {_GOPHER_MIN_MWL} AND mwl <= {_GOPHER_MAX_MWL}) AS mwl_ok,
       (alpha_frac >= {_GOPHER_MIN_ALPHA_FRAC}) AS alpha_ok,
       (stop_hits >= {_GOPHER_MIN_STOP_HITS}) AS stopwords_ok,
       ((n_words >= {_GOPHER_MIN_WORDS} AND n_words <= {_GOPHER_MAX_WORDS})
        AND (mwl >= {_GOPHER_MIN_MWL} AND mwl <= {_GOPHER_MAX_MWL})
        AND alpha_frac >= {_GOPHER_MIN_ALPHA_FRAC}
        AND stop_hits >= {_GOPHER_MIN_STOP_HITS}) AS gopher_pass
FROM f ORDER BY doc_id
"""


def q_train_val_split(spark, sf_dir):
    """Content-hash split: bucket = first 15 hex digits of
    md5(doc_id || salt) as an integer, mod 1000 — engine-agnostic (both
    sides parse the same hex substring) and rerun-stable, unlike
    rand(seed) whose stream depends on partitioning."""
    d = _docs(spark, sf_dir)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(_SPLIT_SALT))
    bucket = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint") \
        % 1000
    return (
        d.select(
            "doc_id",
            F.when(bucket < _SPLIT_TRAIN_PERMILLE, "train")
            .otherwise("val").alias("split"),
        )
        .orderBy("doc_id")
    )


ORACLE_SPLIT = f"""
SELECT doc_id,
       CASE WHEN CAST(('0x' || substr(
                md5(CAST(doc_id AS VARCHAR) || '{_SPLIT_SALT}'), 1, 15))
                AS BIGINT) % 1000 < {_SPLIT_TRAIN_PERMILLE}
            THEN 'train' ELSE 'val' END AS split
FROM documents ORDER BY doc_id
"""


def q_benchmark_contamination(spark, sf_dir):
    """Decontamination: docs sharing any 8-gram with the benchmark probe
    set (doc_id % 50 == 0 stands in for an eval suite). Gram hashes
    shuffle once; the benchmark gram set is tiny → at scale it broadcasts
    and the check is map-only over the corpus."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    ).where(F.size("toks") >= _CONTAM_K)
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - _CONTAM_K + 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i, _CONTAM_K))),
            )
        ).alias("gram_hash"),
    )
    bench = grams.where(F.col("doc_id") % 50 == 0) \
        .select("gram_hash").distinct()
    return (
        grams.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "gram_hash")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram_hash").alias("n_contaminated_grams"))
        .orderBy("doc_id")
    )


ORACLE_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id,
         md5(unnest(list_transform(
             generate_series(1, len(ts) - {_CONTAM_K - 1}),
             i -> array_to_string(ts[i:i+{_CONTAM_K - 1}], ' ')))) AS gram_hash
  FROM toks WHERE len(ts) >= {_CONTAM_K}
),
bench AS (SELECT DISTINCT gram_hash FROM grams WHERE doc_id % 50 = 0)
SELECT g.doc_id,
       CAST(count(DISTINCT g.gram_hash) AS BIGINT) AS n_contaminated_grams
FROM grams g JOIN bench b USING (gram_hash)
WHERE g.doc_id % 50 <> 0
GROUP BY g.doc_id ORDER BY g.doc_id
"""


def q_repetition_flags(spark, sf_dir):
    """Gopher repetition rules (the other half of §A1.1): fraction of
    n-grams taken by the single most frequent 2-/3-gram. Thresholds are
    checked by INTEGER cross-multiplication (max·5 ≤ total for 0.20,
    max·50 ≤ total·9 for 0.18) so no float ever crosses the engine
    boundary. One explode + two aggregations per n; map-side combine
    makes it scan-shaped at scale."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )

    def gram_stats(n, max_col, total_col):
        grams = d.where(F.size("toks") >= n).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - n + 1),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
                )
            ).alias("gram"),
        )
        return (
            grams.groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").cast("bigint").alias(max_col),
                 F.sum("c").cast("bigint").alias(total_col))
        )

    g2 = gram_stats(2, "max_2gram_n", "n_2grams")
    g3 = gram_stats(3, "max_3gram_n", "n_3grams")
    # LEFT join: a 2-token doc has 2-grams but no 3-grams — it must still
    # get a row, with the 3-gram arm vacuously passing (0·50 ≤ 0·9)
    return (
        g2.join(g3, "doc_id", "left")
        .select(
            "doc_id", "n_2grams", "max_2gram_n",
            F.coalesce("n_3grams", F.lit(0)).cast("bigint")
            .alias("n_3grams"),
            F.coalesce("max_3gram_n", F.lit(0)).cast("bigint")
            .alias("max_3gram_n"),
            (F.col("max_2gram_n") * 5 <= F.col("n_2grams")).alias("top2_ok"),
            (F.coalesce("max_3gram_n", F.lit(0)) * 50
             <= F.coalesce("n_3grams", F.lit(0)) * 9).alias("top3_ok"),
        )
        .orderBy("doc_id")
    )


ORACLE_REPETITION = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
),
g2 AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_2gram_n,
         CAST(sum(c) AS BIGINT) AS n_2grams
  FROM (
    SELECT doc_id, gram, count(*) AS c FROM (
      SELECT doc_id, unnest(list_transform(
          generate_series(1, len(ts) - 1),
          i -> ts[i] || ' ' || ts[i+1])) AS gram
      FROM toks WHERE len(ts) >= 2)
    GROUP BY doc_id, gram)
  GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_3gram_n,
         CAST(sum(c) AS BIGINT) AS n_3grams
  FROM (
    SELECT doc_id, gram, count(*) AS c FROM (
      SELECT doc_id, unnest(list_transform(
          generate_series(1, len(ts) - 2),
          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS gram
      FROM toks WHERE len(ts) >= 3)
    GROUP BY doc_id, gram)
  GROUP BY doc_id
)
SELECT g2.doc_id, n_2grams, max_2gram_n,
       CAST(coalesce(n_3grams, 0) AS BIGINT) AS n_3grams,
       CAST(coalesce(max_3gram_n, 0) AS BIGINT) AS max_3gram_n,
       (max_2gram_n * 5 <= n_2grams) AS top2_ok,
       (coalesce(max_3gram_n, 0) * 50
        <= coalesce(n_3grams, 0) * 9) AS top3_ok
FROM g2 LEFT JOIN g3 ON g2.doc_id = g3.doc_id
ORDER BY g2.doc_id
"""


_QUOTA_PER_SOURCE = 20
_QUOTA_SALT = "quota-v1"


def q_source_quota_sample(spark, sf_dir):
    """Per-domain quota sampling (domain balancing): keep the first N docs
    per source in content-hash order — deterministic, engine-stable (the
    md5 rank replaces rand()), and at scale a single window over the
    source-partitioned shuffle. The kept set is independent of scan or
    partition order."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    rank_key = F.md5(F.concat(F.col("doc_id").cast("string"),
                              F.lit(_QUOTA_SALT)))
    w = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _QUOTA_PER_SOURCE)
        .select("doc_id", "source", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("source", "rn")
    )


ORACLE_QUOTA = f"""
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_QUOTA_SALT}'),
                      doc_id) AS rn
  FROM documents)
WHERE rn <= {_QUOTA_PER_SOURCE}
ORDER BY source, rn
"""


QUERIES = {
    "gopher_quality_flags": q_gopher_quality_flags,
    "repetition_flags": q_repetition_flags,
    "train_val_split": q_train_val_split,
    "source_quota_sample": q_source_quota_sample,
    "benchmark_contamination": q_benchmark_contamination,
}

ORACLES = {
    "gopher_quality_flags": ORACLE_GOPHER,
    "repetition_flags": ORACLE_REPETITION,
    "train_val_split": ORACLE_SPLIT,
    "source_quota_sample": ORACLE_QUOTA,
    "benchmark_contamination": ORACLE_CONTAMINATION,
}
