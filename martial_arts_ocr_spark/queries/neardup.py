"""Near-duplicate detection operators (oracle-checked where expressible).

Training-pipeline dedup family beyond exact hashing (textops) and
MinHash/SimHash sketches (similarity):

* embedding-cosine near-dup pairs — self-join with JVM-side dot products;
* token-set Jaccard near-dup pairs — array_intersect/array_union algebra;
* IVF-style ANN — deterministic coarse quantizer (first-K vectors as
  centroids), probe the query's nearest clusters only: the scale path that
  avoids scanning all N vectors per query.

Scale notes: the cosine self-join is O(N²) within blocks — at corpus scale
it runs ONLY inside LSH/MinHash candidate buckets (similarity.py provides
the bucketing); the blocked variants here keep the same expressions. IVF
turns per-query cost from O(N) into O(N/K · probes).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def _emb(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))


# --- embedding-cosine near-dup pairs -------------------------------------------

def q_cosine_neardup_pairs(spark, sf_dir):
    """Pairs with cosine ≥ 0.30 among same-LSH-bucket vectors — the
    registered query IS the 100 TB plan: map-only signature UDF → self
    equi-join on bucket id → exact cosine only inside buckets (never
    all-pairs). Oracle reproduces the buckets via the baked-literal
    hyperplane matrix."""
    from .similarity import _lsh_signature_udf

    sig = _lsh_signature_udf()
    emb = _emb(spark, sf_dir).select(
        "vec_id", "embedding",
        sig(F.col("embedding")).alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    ).persist()          # signatures computed ONCE and reused by both join
    # sides (at warehouse scale this is a materialized signature table;
    # without it the self-join evaluates the signature UDF twice per row)
    a, b = emb.alias("a"), emb.alias("b")
    cos = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")), 5,
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").cast("bigint").alias("bucket"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= 0.30)
        .orderBy("vec_a", "vec_b")
    )


def _oracle_cosine_pairs() -> str:
    from .similarity import lsh_bucket_sql_expr

    return f"""
WITH sig AS (
  SELECT vec_id, embedding, CAST({lsh_bucket_sql_expr()} AS BIGINT) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       round(CAST(list_cosine_similarity(a.embedding, b.embedding)
             AS DOUBLE), 5) AS cosine
FROM sig a JOIN sig b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(CAST(list_cosine_similarity(a.embedding, b.embedding)
      AS DOUBLE), 5) >= 0.30
ORDER BY vec_a, vec_b
"""


ORACLE_COSINE_PAIRS = _oracle_cosine_pairs()


# --- token-set Jaccard near-dup pairs -------------------------------------------

def q_jaccard_neardup_pairs(spark, sf_dir):
    """Token-set Jaccard ≥ 0.8 for same-(lang, source) doc pairs — the
    n-gram Jaccard family with unigram token sets (SQL-expressible both
    engines; shingled variants run in the MinHash path)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source",
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        .alias("toks"),
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    jac = F.round(inter / union, 5)
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.source") == F.col("b.source"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )


ORACLE_JACCARD_PAIRS = """
WITH t AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / len(list_distinct(list_concat(a.toks, b.toks))), 5) AS jaccard
FROM t a JOIN t b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / len(list_distinct(list_concat(a.toks, b.toks))), 5) >= 0.8
ORDER BY doc_a, doc_b
"""


# --- IVF-style ANN ---------------------------------------------------------------

_N_CENTROIDS = 8
_N_PROBE = 2


def q_ivf_ann_top5(spark, sf_dir):
    """IVF ANN: centroids = vectors 0..7 (deterministic coarse quantizer);
    every vector is assigned to its max-cosine centroid; the query
    (vec_id 42) probes its 2 nearest clusters and ranks only their members.

    The scale path: assignment is a broadcast join against K centroids
    (map-only); per-query work is O(N·probes/K) instead of O(N)."""
    emb = _emb(spark, sf_dir)
    cents = (
        emb.where(F.col("vec_id") < _N_CENTROIDS)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec"))
    )
    scored = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "label", "embedding", "cent_id",
            (_dot(F.col("embedding"), F.col("cvec"))
             / (_norm(F.col("embedding")) * _norm(F.col("cvec"))))
            .alias("ccos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cent_id")
    )
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _N_PROBE)
        .select("vec_id", "label", "embedding", "cent_id", "rk")
    )
    # cluster members = rank-1 assignment; query probes rank 1..2
    members = assigned.where(F.col("rk") == 1)
    qprobe = assigned.where(F.col("vec_id") == 42).select(
        F.col("cent_id").alias("probe_cent"),
        F.col("embedding").alias("qvec"),
    )
    cand = members.join(
        F.broadcast(qprobe),
        members.cent_id == qprobe.probe_cent,
    ).where(F.col("vec_id") != 42)
    cos = F.round(
        _dot(F.col("embedding"), F.col("qvec"))
        / (_norm(F.col("embedding")) * _norm(F.col("qvec"))), 5,
    )
    return (
        cand.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


ORACLE_IVF = """
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT e.vec_id, e.label, e.embedding, c.cent_id,
         list_cosine_similarity(e.embedding, c.cvec) AS ccos,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC,
                      c.cent_id ASC) AS rk
  FROM embeddings e CROSS JOIN cents c
), members AS (
  SELECT vec_id, label, embedding, cent_id FROM scored WHERE rk = 1
), qprobe AS (
  SELECT cent_id AS probe_cent, embedding AS qvec
  FROM scored WHERE vec_id = 42 AND rk <= 2
)
SELECT m.vec_id, m.label,
       round(CAST(list_cosine_similarity(m.embedding, q.qvec) AS DOUBLE), 5)
         AS cosine
FROM members m JOIN qprobe q ON m.cent_id = q.probe_cent
WHERE m.vec_id <> 42
ORDER BY cosine DESC, m.vec_id ASC
LIMIT 5
"""


# --- repeated n-gram spans across documents ------------------------------------

_SPAN_K = 8      # words per span (the dedup-literature "repeated substring"
                 # op uses fixed-k shingle counting at scale, not suffix
                 # arrays: one explode + one groupBy, both linear)


def q_repeated_spans(spark, sf_dir):
    """Cross-document repeated 8-word spans: any k-gram occurring in more
    than one document (substring-level duplication, the span-dedup
    operator from the training-data dedup literature). JVM-side sliding
    windows (sequence/transform/slice over the token array), md5 span
    keys, one shuffle on the span hash."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    ).where(F.size("toks") >= _SPAN_K)
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - _SPAN_K + 1),
                lambda i: F.concat_ws(" ", F.slice("toks", i, _SPAN_K)),
            )
        ).alias("gram"),
    )
    return (
        grams.select("doc_id", F.md5("gram").alias("gram_hash"))
        .groupBy("gram_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy("gram_hash")
    )


ORACLE_REPEATED_SPANS = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
             generate_series(1, len(ts) - {_SPAN_K - 1}),
             i -> array_to_string(ts[i:i+{_SPAN_K - 1}], ' '))) AS gram
  FROM toks WHERE len(ts) >= {_SPAN_K}
)
SELECT md5(gram) AS gram_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) > 1
ORDER BY gram_hash
"""


QUERIES = {
    "repeated_spans": q_repeated_spans,
    "cosine_neardup_pairs": q_cosine_neardup_pairs,
    "jaccard_neardup_pairs": q_jaccard_neardup_pairs,
    "ivf_ann_top5": q_ivf_ann_top5,
}

ORACLES = {
    "repeated_spans": ORACLE_REPEATED_SPANS,
    "cosine_neardup_pairs": ORACLE_COSINE_PAIRS,
    "jaccard_neardup_pairs": ORACLE_JACCARD_PAIRS,
    "ivf_ann_top5": ORACLE_IVF,
}
