"""Similarity / dedup operators over `embeddings` and `documents`.

The large-scale training-pipeline additions:

* brute-force cosine top-k (oracle: DuckDB ``list_cosine_similarity``) —
  the correctness baseline for ANN;
* LSH-bucketed cosine (scale path: random-hyperplane signatures → bucket
  equi-join; avoids the O(N²) cross join at corpus scale);
* MinHash near-dup candidates over word shingles (banding → bucket join) —
* SimHash fingerprints.

All of these are ORACLE-EXACT: DuckDB's ``md5_number_upper`` equals the
UDFs' md5-based ``_stable_hash64``, so the sketches are reproduced in SQL
with HUGEINT wrapping-arithmetic emulation (see the ORACLES section).

All Python math runs in Arrow-batched pandas UDFs over numpy (no per-row
Python); bucket joins are ordinary Spark shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from martial_arts_ocr_spark.queries.tables import base_table, spread_table


def _emb(spark: SparkSession, sf_dir: str):
    return base_table(spark, sf_dir, "embeddings")


def _docs(spark: SparkSession, sf_dir: str):
    return base_table(spark, sf_dir, "documents")


# --- brute-force cosine top-k vs a fixed query vector (vec_id = 0) --------------

def q_ann_cosine_top10(spark, sf_dir):
    """Top-10 nearest to vec_id 0 by cosine, brute force.

    Query vector is broadcast as a literal array; the dot product runs
    JVM-side via higher-order functions (zip_with + aggregate) — no Python.
    At 100 TB the same plan holds: one scan, no shuffle except the final
    top-k (which AQE executes as a partial+final TakeOrdered).
    """
    emb = _emb(spark, sf_dir)
    # memoized per (session, sf): the eager head() is a full-scan Spark
    # job that otherwise re-runs on EVERY invocation (gate × 3 SFs, every
    # bench repetition) before the real query starts (review-found)
    key = (spark.sparkContext.applicationId, sf_dir, "ann_qvec")
    qvec = _SIG_CACHE.get(key)
    if qvec is None:
        qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
        if qrow is None:
            raise ValueError(
                "embeddings table has no vec_id 0 (fixed ANN query vector)"
            )
        qvec = list(qrow["embedding"])
        _sig_cache_put(spark, key, qvec)
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_e = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    norm_q = F.sqrt(F.aggregate(
        F.transform(q, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x,
    ))
    cos = F.round(dot / (norm_e * norm_q), 5)
    return (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# embeddings are FLOAT[]; list_cosine_similarity would compute in float32
# while Spark's zip_with/aggregate fold is float64 — cast the INPUTS to
# DOUBLE[] or rounded values diverge (confirmed: vec 373 at sf0.01 rounds
# to -0.12823 in f32 vs -0.12824 in f64; review-found, applied to every
# cosine oracle)
ORACLE_ANN = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0)
SELECT vec_id, label,
       round(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT qv FROM q)) AS DOUBLE), 5) AS cosine
FROM embeddings WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


# --- per-label embedding norms (vector agg sanity surface) ----------------------

def q_embedding_norms(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("norm"), 4).alias("avg_norm"))
        .orderBy("label")
    )


ORACLE_NORMS = """
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(CAST(avg(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS DOUBLE), 4) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
"""


# --- LSH-bucketed cosine neighbors (scale path) -----------------------------------

_LSH_PLANES = 16


def _lsh_planes(dim: int):
    """Deterministic hyperplanes for a given embedding width.

    The width is derived from the data (round-1 hardcoded 64 and crashed on
    any other table); the fixed seed keeps the matrix identical across
    executors, runs, and the baked-literal DuckDB oracle.
    """
    import numpy as np

    rng = np.random.RandomState(42)
    return rng.standard_normal((_LSH_PLANES, dim))


def _lsh_signature_udf():
    import numpy as np

    @pandas_udf(T.IntegerType())
    def sig(emb: pd.Series) -> pd.Series:
        if emb.empty:
            return pd.Series([], dtype="int32")
        arrs = np.stack(emb.apply(lambda v: np.asarray(v, dtype=np.float64)))
        mat = _lsh_planes(arrs.shape[1])
        # round before the sign test so the DuckDB oracle (sequential
        # list_dot_product sum order) lands on the same side of zero
        bits = np.round(arrs @ mat.T, 7) > 0
        out = np.zeros(len(arrs), dtype=np.int32)
        for i in range(_LSH_PLANES):
            out = (out << 1) | bits[:, i].astype(np.int32)
        return pd.Series(out)

    return sig


_SIG_CACHE: dict[tuple, "object"] = {}


def _sig_cache_put(spark, key, df) -> None:
    """Insert into _SIG_CACHE, first evicting entries from other Spark
    applications: cache keys lead with applicationId, and classic pyspark
    runs one active context per process, so any other appId belongs to a
    stopped session whose persisted DataFrames would otherwise stay
    referenced for the process lifetime (round-3 ADVICE; pytest runs many
    sessions in one process)."""
    app = spark.sparkContext.applicationId
    for k in [k for k in _SIG_CACHE if k[0] != app]:
        del _SIG_CACHE[k]
    _SIG_CACHE[key] = df


def _lsh_signatures_cached(spark, sf_dir):
    """Persisted (vec_id, label, bucket) signature table, cached per
    (session, sf_dir): repeated invocations in one process (gate + bench
    rounds) reuse ONE cached table instead of leaking a new persist()
    per call (review-found). The materialized-signature-table analogue at
    warehouse scale; both self-join sides read it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _SIG_CACHE.get(key)
    if df is None:
        sig = _lsh_signature_udf()
        df = _emb(spark, sf_dir).select(
            "vec_id", "label", sig(F.col("embedding")).alias("bucket")
        ).persist()
        _sig_cache_put(spark, key, df)
    return df


def q_lsh_bucket_candidates(spark, sf_dir):
    """Near-neighbor candidate pairs via random-hyperplane LSH buckets.

    The 100 TB plan: signature (map-only, Arrow-vectorized) → self equi-join
    on bucket id (hash shuffle on 2^16 keys) → pair scoring only inside
    buckets. Candidate count here, pairs verified by exact cosine in a
    follow-up stage.
    """
    with_sig = _lsh_signatures_cached(spark, sf_dir)
    a = with_sig.alias("a")
    b = with_sig.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            (F.col("a.label") == F.col("b.label")).alias("same_label"),
        )
        .orderBy("vec_a", "vec_b")
    )
    return pairs


def lsh_bucket_sql_expr(dim: int = 64) -> str:
    """DuckDB expression computing the LSH bucket of column `embedding`,
    with the hyperplane matrix baked in as literals (same fixed seed as
    the Spark UDF). Both sides round the dot product to 7 decimals before
    the sign test, so summation-order rounding cannot flip a bucket bit.
    Shared by the lsh_bucket_candidates and cosine_neardup_pairs oracles."""
    mat = _lsh_planes(dim)
    terms = []
    for i in range(_LSH_PLANES):
        vec = "[" + ", ".join(repr(float(x)) for x in mat[i]) + "]"
        weight = 1 << (_LSH_PLANES - 1 - i)
        terms.append(
            f"(CASE WHEN round(CAST(list_dot_product("
            f"CAST(embedding AS DOUBLE[]), {vec}) "
            f"AS DOUBLE), 7) > 0 THEN {weight} ELSE 0 END)"
        )
    return " + ".join(terms)


def _lsh_oracle_sql(dim: int = 64) -> str:
    """Full DuckDB oracle for lsh_bucket_candidates (the test tables'
    embeddings are 64-wide; the oracle only runs there)."""
    bucket = lsh_bucket_sql_expr(dim)
    return f"""
WITH sig AS (
  SELECT vec_id, label, CAST({bucket} AS INTEGER) AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       (a.label = b.label) AS same_label
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
ORDER BY vec_a, vec_b
"""


# --- MinHash near-dup candidates over documents -----------------------------------

_MINHASH_PERMS = 32
_MINHASH_BANDS = 8          # 8 bands × 4 rows
_SHINGLE = 3


def _stable_hash64(s: str) -> int:
    """Process-independent 63-bit hash (built-in hash() is salted per
    process — it would break byte-identity across runs/executors)."""
    import hashlib

    return int.from_bytes(
        hashlib.md5(s.encode("utf-8")).digest()[:8], "little"
    ) & 0x7FFFFFFFFFFFFFFF


def _md5_batch64(strings):
    """md5-based 63-bit hashes for a sequence of strings (vocab-sized loop;
    every repeated string in the batch is hashed exactly once upstream).
    Single source of truth: delegates to _stable_hash64 so the scalar and
    batch definitions can never drift (review-found duplication)."""
    import numpy as np

    out = np.empty(len(strings), dtype=np.int64)
    h = _stable_hash64
    for i, s in enumerate(strings):
        out[i] = h(s)
    return out


def minhash_signatures_batch(text: pd.Series) -> pd.Series:
    """Vectorized MinHash: batch-level shingle dedup (factorize → md5 once
    per unique shingle) + per-permutation `minimum.reduceat` over the flat
    shingle array. Bit-identical to the round-1 per-row loop — pinned by
    tests/test_sketch_golden.py. Duplicate shingles within a doc don't
    affect the min, so no per-doc set is needed.
    """
    import numpy as np

    rng = np.random.RandomState(42)
    # universal-hash parameters (odd multipliers), 61-bit Mersenne prime;
    # the a*s multiply intentionally wraps in int64 (same as round 1)
    P = (1 << 61) - 1
    a = rng.randint(1, P, size=_MINHASH_PERMS, dtype=np.int64) | 1
    b = rng.randint(0, P, size=_MINHASH_PERMS, dtype=np.int64)

    shingles: list[str] = []
    starts = np.empty(len(text), dtype=np.int64)
    for di, t in enumerate(text):
        starts[di] = len(shingles)
        toks = t.split()
        if len(toks) < _SHINGLE:
            shingles.append(t)
        else:
            shingles.extend(
                " ".join(toks[i:i + _SHINGLE])
                for i in range(len(toks) - _SHINGLE + 1)
            )
    if not shingles:
        return pd.Series([], dtype=object)
    codes, uniques = pd.factorize(pd.Series(shingles, dtype=object))
    flat = _md5_batch64(list(uniques))[codes]
    sigs = np.empty((len(text), _MINHASH_PERMS), dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(_MINHASH_PERMS):
            vals = (flat * a[j] + b[j]) % P
            sigs[:, j] = np.minimum.reduceat(vals, starts)
    return pd.Series([row.tolist() for row in sigs])


def _minhash_udf():
    out_t = T.ArrayType(T.LongType())

    @pandas_udf(out_t)
    def mh(text: pd.Series) -> pd.Series:
        return minhash_signatures_batch(text)

    return mh


def minhash_band_keys_batch(text: pd.Series) -> pd.Series:
    """Per-doc band keys: the 32-perm signature folded into _MINHASH_BANDS
    64-bit FNV-mixed keys. Equal signatures ⇒ equal keys; 64-bit keys over
    ~10^5 candidate groups make collisions negligible (and a collision only
    ever ADDS a candidate pair, which exact verification then rejects).
    Shipping 8 ints/doc instead of 32 + doing the fold in numpy replaces
    the JVM-side 32-getItem + concat_ws banding."""
    import numpy as np

    sigs = minhash_signatures_batch(text)
    if sigs.empty:
        return sigs
    arr = np.asarray([s for s in sigs], dtype=np.uint64)
    arr = arr.reshape(len(arr), _MINHASH_BANDS, -1)
    keys = np.full(arr.shape[:2], 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(arr.shape[2]):
            keys = (keys ^ arr[:, :, j]) * np.uint64(0x100000001B3)
    signed = keys.view(np.int64)
    return pd.Series([row.tolist() for row in signed])


def _minhash_band_keys_udf():
    @pandas_udf(T.ArrayType(T.LongType()))
    def mhb(text: pd.Series) -> pd.Series:
        return minhash_band_keys_batch(text)

    # asNondeterministic stops Catalyst duplicating the sketch: the
    # posexplode Generate downstream infers `size(band_keys) > 0 AND
    # isnotnull(band_keys)` and pushes it below the projection by
    # RE-EVALUATING the UDF (two ArrowEvalPython nodes for one call —
    # the whole 32-perm MinHash ran twice per doc in minhash_bands,
    # sigstore.band_keys and incremental_snapshot_dedup; optimization
    # guide §4.4). The function itself is md5-deterministic, so retry
    # semantics are unchanged; the flag only forbids the optimizer from
    # copying or reordering the call.
    return mhb.asNondeterministic()


def _minhash_band_groups(spark, sf_dir):
    """Internal: candidate groups with the doc list as an array column.
    Used by the verified-pairs pipeline; NOT registered directly — the
    driver's canonicalizer cannot sort array-typed columns (the one red
    row in CORRECTNESS_r01)."""
    # narrow projection + scale-adaptive spread BEFORE the sketch UDF:
    # single-row-group inputs otherwise run the whole 32-perm MinHash on
    # one core (tables.spread docstring has the measurements)
    d = spread_table(spark, sf_dir, "documents", "doc_id", "text")
    mhb = _minhash_band_keys_udf()
    keys = d.select("doc_id", mhb(F.col("text")).alias("band_keys"))
    bands = keys.select(
        "doc_id", F.posexplode(F.col("band_keys")).alias("band", "band_key")
    )
    return (
        bands.groupBy("band", "band_key")
        .agg(F.collect_set("doc_id").alias("docs"),
             F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("band", F.sort_array("docs").alias("docs"), "n")
    )


def q_minhash_bands(spark, sf_dir):
    """MinHash → banded bucket keys; groups with >1 doc are near-dup
    candidates. Scalar columns only: the doc list is emitted as a
    comma-joined string so the driver gate can canonicalize it.
    """
    groups = _minhash_band_groups(spark, sf_dir)
    doc_ids = F.concat_ws(
        ",", F.transform(F.col("docs"), lambda d: d.cast("string"))
    )
    return (
        groups.select("band", doc_ids.alias("doc_ids"), "n")
        .orderBy("band", "doc_ids")
    )


# --- SimHash fingerprints ---------------------------------------------------------

def simhash_batch(text: pd.Series) -> pd.Series:
    """Vectorized SimHash: per-doc unique tokens → batch-level vocab md5
    (each distinct token hashed once per batch) → `np.unpackbits` bit matrix
    → per-doc `add.reduceat` column sums → sign → repack. Bit-identical to
    the round-1 per-token/per-bit loop — pinned by tests/test_sketch_golden.py.
    """
    import numpy as np

    n = len(text)
    tok_lists = [sorted(set(t.split())) for t in text]
    counts = np.array([len(l) for l in tok_lists], dtype=np.int64)
    flat_toks: list[str] = []
    for l in tok_lists:
        flat_toks.extend(l)
    if not flat_toks:
        return pd.Series(np.zeros(n, dtype=np.int64))
    codes, uniques = pd.factorize(pd.Series(flat_toks, dtype=object))
    th = _md5_batch64(list(uniques))[codes].astype(np.uint64)
    # column k of `bits` == (h >> k) & 1 (little-endian byte view + bitorder)
    bits = np.unpackbits(
        th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    # sentinel zero row: lets reduceat handle empty docs at the tail
    bits_x = np.vstack([bits, np.zeros((1, 64), dtype=np.int64)])
    sums = np.add.reduceat(bits_x, np.minimum(starts, len(bits)), axis=0)
    acc = 2 * sums - counts[:, None]       # (+1 per set bit, -1 per clear)
    acc[counts == 0] = 0                   # mask garbage rows of empty docs
    out_bits = (acc > 0).astype(np.uint64)
    packed = (out_bits << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    return pd.Series(packed.view(np.int64))


def _simhash_udf():
    @pandas_udf(T.LongType())
    def sh(text: pd.Series) -> pd.Series:
        return simhash_batch(text)

    return sh


def q_simhash(spark, sf_dir):
    d = _docs(spark, sf_dir)
    sh = _simhash_udf()
    return (
        d.where(F.col("doc_id") < 50)
        .select("doc_id", sh(F.col("text")).alias("simhash"))
        .orderBy("doc_id")
    )


_SIMHASH_BANDS = 4          # 4 × 16-bit bands over the 64-bit fingerprint
_SIMHASH_MAX_HAMMING = 8
_NEARDUP_SUFFIX = " near duplicate suffix"   # shared with the SQL oracle


def q_simhash_neardup_pairs(spark, sf_dir):
    """SimHash near-dup pipeline: fingerprint → 16-bit band buckets →
    equi-join candidates → exact Hamming (JVM bit_count(xor)) ≤ 8.

    The 100 TB shape: banding turns Hamming search into bucket equi-joins
    (a pair within Hamming 8 of a 64-bit fingerprint shares at least one
    of 4 bands unless the flips split exactly 2+ per band — standard LSH
    recall trade); exact verification runs only inside buckets. The demo
    corpus is `documents` unioned with a one-suffix perturbation of itself
    (doc_id + 100000) so deterministic true near-dups exist; at scale the
    input is the corpus itself. Oracle-exact (md5_number_upper emulation).
    """
    key = (spark.sparkContext.applicationId, sf_dir, "simhash_nd")
    sigs = _SIG_CACHE.get(key)
    if sigs is None:
        sh = _simhash_udf()
        d = _docs(spark, sf_dir).select("doc_id", "text")
        pert = d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(_NEARDUP_SUFFIX)).alias("text"),
        )
        sigs = d.unionByName(pert).select(
            "doc_id", sh(F.col("text")).alias("simhash")
        ).persist()      # sketch once per session; both join sides reuse
        _sig_cache_put(spark, key, sigs)
    bands = sigs.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftright("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF))
            for b in range(_SIMHASH_BANDS)
        ])).alias("band", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= _SIMHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


def q_minhash_verified_pairs(spark, sf_dir):
    """Full near-dup pipeline: MinHash bands → candidate pairs → exact
    token-Jaccard verification ≥ 0.5. The 100 TB shape: the expensive
    exact check runs ONLY on sketch candidates, never all-pairs.
    Oracle-exact (md5_number_upper emulation)."""
    cands = _minhash_band_groups(spark, sf_dir)
    pairs = (
        cands.select(F.explode(F.col("docs")).alias("doc_a"), "docs")
        .select("doc_a", F.explode(F.col("docs")).alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
    )
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    jac = F.round(
        F.size(F.array_intersect("ta", "tb"))
        / F.size(F.array_union("ta", "tb")), 5,
    )
    return (
        joined.select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


# --- incremental cross-snapshot dedup (round-4 VERDICT item 3) -------------------

def q_incremental_snapshot_dedup(spark, sf_dir):
    """Dedup a NEW snapshot against a persisted signature STORE before any
    in-snapshot dedup — the incremental flow every production pipeline
    runs per crawl (the self-dedup operators above assume one static
    corpus). Demo split: even doc_ids are the already-ingested history
    (their band keys ARE the store), odd doc_ids are the new snapshot.
    Per new doc: how many distinct MinHash bands it shares with the store,
    and its status — ``dup_vs_store`` (any store band hit, never enters
    the corpus), else ``dup_in_snapshot`` (shares a band with a
    lower-doc_id new doc — min-id-wins within the snapshot), else ``new``.

    The persisted-store composition over a real warehouse (append-only
    ``signatures`` table + snapshot log + exactly-once re-append guard)
    is engine/sigstore.py, exercised by tests/test_sigstore.py; this
    registered query oracles the same semantics via the exact SQL band
    mirror (_minhash_keyed_cte). Scale shape: band keys are 8 longs per
    doc computed in one map-only vectorized UDF pass; the store probe is
    an equi-join on (band, band_key) — bucket the store on that key at
    100 TB and the probe co-locates; no all-pairs join anywhere."""
    d = _docs(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "incr_band_keys")
    keys = _SIG_CACHE.get(key)
    if keys is None:
        mhb = _minhash_band_keys_udf()
        keys = spread_table(spark, sf_dir, "documents", "doc_id", "text").select(
            "doc_id",
            F.posexplode(mhb(F.col("text"))).alias("band", "band_key"),
        ).persist()        # sketch ONCE; store/new/self-join all reuse it
        _sig_cache_put(spark, key, keys)
    store = (keys.where(F.col("doc_id") % 2 == 0)
             .select("band", "band_key").distinct())
    new = keys.where(F.col("doc_id") % 2 == 1)
    hits = (
        new.join(store, ["band", "band_key"])
        .groupBy("doc_id")
        .agg(F.countDistinct("band").alias("n_store_bands"))
    )
    a, b = new.alias("a"), new.alias("b")
    in_snap = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("b.doc_id").alias("doc_id")).distinct()
        .withColumn("in_snap", F.lit(True))
    )
    base = d.where(F.col("doc_id") % 2 == 1).select("doc_id")
    out = base.join(hits, "doc_id", "left").join(in_snap, "doc_id", "left")
    status = (
        F.when(F.col("n_store_bands").isNotNull(), "dup_vs_store")
        .when(F.col("in_snap"), "dup_in_snapshot")
        .otherwise("new")
    )
    return out.select(
        "doc_id",
        F.coalesce("n_store_bands", F.lit(0)).cast("bigint")
        .alias("n_store_bands"),
        status.alias("status"),
    ).orderBy("doc_id")


def _incremental_snapshot_oracle() -> str:
    return f"""
WITH {_minhash_keyed_cte()},
store AS (
  SELECT DISTINCT band, band_key FROM keyed WHERE doc_id % 2 = 0
),
new_keys AS (
  SELECT * FROM keyed WHERE doc_id % 2 = 1
),
vs_store AS (
  SELECT n.doc_id, count(DISTINCT n.band) AS n_store_bands
  FROM new_keys n JOIN store s
    ON n.band = s.band AND n.band_key = s.band_key
  GROUP BY n.doc_id
),
in_snap AS (
  SELECT DISTINCT y.doc_id
  FROM new_keys x JOIN new_keys y
    ON x.band = y.band AND x.band_key = y.band_key
       AND x.doc_id < y.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(v.n_store_bands, 0) AS BIGINT) AS n_store_bands,
       CASE WHEN v.doc_id IS NOT NULL THEN 'dup_vs_store'
            WHEN i.doc_id IS NOT NULL THEN 'dup_in_snapshot'
            ELSE 'new' END AS status
FROM documents d
LEFT JOIN vs_store v ON v.doc_id = d.doc_id
LEFT JOIN in_snap i ON i.doc_id = d.doc_id
WHERE d.doc_id % 2 = 1
ORDER BY d.doc_id
"""


QUERIES = {
    "incremental_snapshot_dedup": q_incremental_snapshot_dedup,
    "ann_cosine_top10": q_ann_cosine_top10,
    "minhash_verified_pairs": q_minhash_verified_pairs,
    "embedding_norms": q_embedding_norms,
    "lsh_bucket_candidates": q_lsh_bucket_candidates,
    "minhash_bands": q_minhash_bands,
    "simhash": q_simhash,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
}

# --- exact SQL oracles for the md5-based sketches ---------------------------------
#
# DuckDB's md5_number_upper(s) equals Python int.from_bytes(md5(s)[:8],
# "little"), so _stable_hash64 IS expressible; the wrapping int64 multiply
# of the minhash permutation is emulated in HUGEINT mod 2^64, and the FNV
# band fold is unrolled step by step. Constants (perm a/b, FNV seed/prime)
# are baked as literals from the same fixed-seed generator the UDF uses.

_TWO63, _TWO64 = 1 << 63, 1 << 64
_P61 = (1 << 61) - 1
_FNV_SEED_SIGNED = 0xCBF29CE484222325 - _TWO64
_FNV_PRIME = 0x100000001B3
_MASK63 = 0x7FFFFFFFFFFFFFFF


def _fnv_step_sql(k_expr: str, v_expr: str) -> str:
    x = f"xor({k_expr}, {v_expr})"
    ux = (f"(CASE WHEN {x} < 0 THEN CAST({x} AS HUGEINT) + {_TWO64} "
          f"ELSE CAST({x} AS HUGEINT) END)")
    uk = f"(({ux} * {_FNV_PRIME}) % {_TWO64})"
    return (f"CAST(CASE WHEN {uk} >= {_TWO63} THEN {uk} - {_TWO64} "
            f"ELSE {uk} END AS BIGINT)")


def _minhash_keyed_cte() -> str:
    """Shared WITH-body computing (doc_id, band, band_key) in DuckDB,
    bit-identical to the Spark UDF pipeline."""
    import numpy as np

    rng = np.random.RandomState(42)
    a = rng.randint(1, _P61, size=_MINHASH_PERMS, dtype=np.int64) | 1
    b = rng.randint(0, _P61, size=_MINHASH_PERMS, dtype=np.int64)
    perm_rows = ", ".join(
        f"({j}, {int(a[j])}, {int(b[j])})" for j in range(_MINHASH_PERMS)
    )
    rows_per_band = _MINHASH_PERMS // _MINHASH_BANDS
    # stepwise FNV fold: one CTE per step referencing the previous step's
    # k COLUMN. Textually nesting _fnv_step_sql instead multiplies the
    # expression ~12× per step (12^4 copies of the seed = ~600 KB of SQL,
    # review-measured) — the chain keeps the oracle linear in fold depth.
    fold_ctes = [
        f"k0 AS (SELECT doc_id, band, "
        + ", ".join(f"s{i}" for i in range(rows_per_band))
        + f", CAST({_FNV_SEED_SIGNED} AS BIGINT) AS k FROM piv)"
    ]
    for i in range(rows_per_band):
        carry = ", ".join(f"s{j}" for j in range(i + 1, rows_per_band))
        carry = (carry + ", ") if carry else ""
        fold_ctes.append(
            f"k{i + 1} AS (SELECT doc_id, band, {carry}"
            f"{_fnv_step_sql('k', f's{i}')} AS k FROM k{i})"
        )
    fold_chain = ",\n".join(fold_ctes)
    piv_cols = ",\n         ".join(
        f"max(CASE WHEN j % {rows_per_band} = {i} THEN sig END) AS s{i}"
        for i in range(rows_per_band)
    )
    return f"""
perms(j, a, b) AS (VALUES {perm_rows}),
toks AS (
  -- mirror Python str.split(): no empty edge tokens (trim() strips
  -- spaces only, so a trailing tab/newline produced a phantom '' token
  -- and divergent shingles — review-found; the remaining Unicode-
  -- whitespace gap is excluded by the printable-ASCII corpus
  -- precondition pinned in tests/test_fixtures_spark.py)
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
shingles AS (
  SELECT doc_id, unnest(CASE WHEN len(ts) >= {_SHINGLE} THEN
      list_transform(generate_series(1, len(ts) - {_SHINGLE - 1}),
                     i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
      ELSE [text] END) AS shingle
  FROM toks
),
hashed AS (
  SELECT DISTINCT doc_id,
         CAST(md5_number_upper(shingle) & {_MASK63} AS BIGINT) AS s
  FROM shingles
),
vals AS (
  SELECT h.doc_id, p.j,
         ((CAST(p.a AS HUGEINT) * h.s + p.b) % {_TWO64}) AS w
  FROM hashed h CROSS JOIN perms p
),
sigs AS (
  SELECT doc_id, j,
         CAST(min(((CASE WHEN w >= {_TWO63} THEN w - {_TWO64} ELSE w END
                    % {_P61}) + {_P61}) % {_P61}) AS BIGINT) AS sig
  FROM vals GROUP BY doc_id, j
),
piv AS (
  SELECT doc_id, j // {rows_per_band} AS band,
         {piv_cols}
  FROM sigs GROUP BY doc_id, j // {rows_per_band}
),
{fold_chain},
keyed AS (
  SELECT doc_id, band, k AS band_key FROM k{rows_per_band}
)"""


def _minhash_bands_oracle() -> str:
    return f"""
WITH {_minhash_keyed_cte()}
SELECT CAST(band AS INT) AS band,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
       CAST(count(*) AS BIGINT) AS n
FROM keyed GROUP BY band, band_key HAVING count(*) > 1
ORDER BY band, doc_ids
"""


def _minhash_verified_pairs_oracle() -> str:
    return f"""
WITH {_minhash_keyed_cte()},
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM keyed x JOIN keyed y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
),
tsets AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS tk
  FROM documents
)
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
             / len(list_distinct(list_concat(a.tk, b.tk))), 5) AS jaccard
FROM pairs p JOIN tsets a ON a.doc_id = p.doc_a
             JOIN tsets b ON b.doc_id = p.doc_b
WHERE round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
      / len(list_distinct(list_concat(a.tk, b.tk))), 5) >= 0.5
ORDER BY doc_a, doc_b
"""


def _simhash_sql_ctes(source_sql: str) -> str:
    """CTE chain computing (doc_id, simhash) over `source_sql` rows of
    (doc_id, text) — bit-identical to simhash_batch."""
    return f"""
corpus AS ({source_sql}),
stoks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM corpus)
  WHERE tok <> ''
), sbits AS (
  SELECT t.doc_id, g.bit,
         sum(CASE WHEN ((CAST(md5_number_upper(t.tok) & {_MASK63}
                         AS BIGINT) >> g.bit) & 1) = 1 THEN 1 ELSE -1 END) AS acc
  FROM stoks t CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) g
  GROUP BY t.doc_id, g.bit
), spacked AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN CAST(power(2, bit) AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS u
  FROM sbits GROUP BY doc_id
), sraw AS (
  SELECT doc_id, CAST(CASE WHEN u >= {_TWO63} THEN u - {_TWO64}
         ELSE u END AS BIGINT) AS simhash
  FROM spacked
), simhashed AS (
  -- left-join back to the corpus: an empty/whitespace-only doc has no
  -- tokens (the tok <> '' filter drops it from sraw) but simhash_batch
  -- still emits 0 for it — mirror that with coalesce (round-2 ADVICE)
  SELECT c.doc_id, coalesce(r.simhash, CAST(0 AS BIGINT)) AS simhash
  FROM corpus c LEFT JOIN sraw r USING (doc_id)
)"""


ORACLE_SIMHASH = f"""
WITH {_simhash_sql_ctes(
    "SELECT doc_id, text FROM documents WHERE doc_id < 50")}
SELECT doc_id, simhash FROM simhashed ORDER BY doc_id
"""


def _simhash_neardup_oracle() -> str:
    src = (
        "SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT doc_id + 100000, text || '{_NEARDUP_SUFFIX}' FROM documents"
    )
    return f"""
WITH {_simhash_sql_ctes(src)},
sbands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (16 * b.band)) & 65535 AS band_val
  FROM simhashed CROSS JOIN
       (SELECT unnest(generate_series(0, {_SIMHASH_BANDS - 1})) AS band) b
),
scands AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS sa, y.simhash AS sb
  FROM sbands x JOIN sbands y
    ON x.band = y.band AND x.band_val = y.band_val AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM scands WHERE bit_count(xor(sa, sb)) <= {_SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


ORACLES = {
    "incremental_snapshot_dedup": _incremental_snapshot_oracle,
    "ann_cosine_top10": ORACLE_ANN,
    "embedding_norms": ORACLE_NORMS,
    # builder CALLABLES, resolved by materialized_oracles() on the driver
    # (CLAUDE.md rule): executors import this module for the pandas UDFs
    # and must not build hyperplane matrices / ~100 KB of oracle SQL at
    # import time (review fix — these four were called here).
    # hyperplane matrix baked into the SQL as literals (fixed seed)
    "lsh_bucket_candidates": _lsh_oracle_sql,
    # md5-based sketches: DuckDB md5_number_upper == the UDFs'
    # _stable_hash64, so even these are oracle-EXACT (wrapping int64
    # arithmetic emulated in HUGEINT)
    "simhash": ORACLE_SIMHASH,
    "simhash_neardup_pairs": _simhash_neardup_oracle,
    "minhash_bands": _minhash_bands_oracle,
    "minhash_verified_pairs": _minhash_verified_pairs_oracle,
}
