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


QUERIES = {
    "gopher_quality_flags": q_gopher_quality_flags,
    "train_val_split": q_train_val_split,
    "benchmark_contamination": q_benchmark_contamination,
}

ORACLES = {
    "gopher_quality_flags": ORACLE_GOPHER,
    "train_val_split": ORACLE_SPLIT,
    "benchmark_contamination": ORACLE_CONTAMINATION,
}
