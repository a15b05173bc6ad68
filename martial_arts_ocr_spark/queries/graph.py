"""Dedup clustering: connected components over near-dup pair edges.

The last step of every dedup pipeline — pairs → clusters → one canonical
doc per cluster. Implemented as iterative min-label propagation over the
MinHash-verified pair edges (queries/similarity.py): each round every node
takes the minimum label among itself and its neighbors; after ≥diameter
rounds every component carries its minimum doc_id. Each round is one
shuffle join + aggregate — the distributed-CC shape (production adds a
convergence check and the large-star/small-star optimization from the
Google connected-components paper; dedup components are near-cliques, so
a small fixed round count is exact here and keeps the query a pure,
deterministic DataFrame expression).

The DuckDB oracle computes the same components with a recursive CTE
(UNION-deduplicated label reachability), composed over the exact verified
-pairs oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .similarity import _minhash_verified_pairs_oracle, q_minhash_verified_pairs

_ROUNDS = 6          # ≥ component diameter; verified-dup components are
                     # near-cliques (diameter ~1-2), 6 is a wide margin


def q_dedup_clusters(spark, sf_dir):
    pairs = q_minhash_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"),
                         F.col("doc_a").alias("dst"))
        )
    )
    labels = (
        edges.select(F.col("src").alias("doc")).distinct()
        .withColumn("lbl", F.col("doc"))
    )
    for _ in range(_ROUNDS):
        neigh = (
            edges.join(labels, edges["src"] == labels["doc"])
            .groupBy(edges["dst"].alias("doc"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        labels = (
            labels.join(neigh, "doc", "left")
            .select(
                "doc",
                F.least(F.col("lbl"),
                        F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
            )
        )
    return (
        labels.select(
            F.col("doc").cast("bigint").alias("doc_id"),
            F.col("lbl").cast("bigint").alias("cluster_id"),
        )
        .orderBy("doc_id")
    )


def _clusters_oracle() -> str:
    return f"""
WITH RECURSIVE vpairs AS MATERIALIZED ({_minhash_verified_pairs_oracle()}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM vpairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM vpairs
),
nodes AS (SELECT DISTINCT src AS doc FROM edges),
reach(doc, lbl) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc
)
SELECT CAST(doc AS BIGINT) AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY doc ORDER BY doc_id
"""


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
}

ORACLES = {
    "dedup_clusters": _clusters_oracle(),
}
