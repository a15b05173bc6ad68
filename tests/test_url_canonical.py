"""Golden adversarial-URL cases for the canonicalizer (round-4 VERDICT
item 5: done-ness includes a golden test with adversarial URLs), plus the
Spark-vs-DuckDB agreement check on the same strings — the regex chains
live in two dialects (Java / RE2) and must not drift."""

import duckdb
import pytest
from pyspark.sql import functions as F

from martial_arts_ocr_spark.queries.textops import (
    canonical_url_expr,
    canonical_url_sql,
)

# (raw, canonical) — each case names the trap it guards
CASES = [
    # uppercase scheme+host lowered, PATH case preserved, port kept
    ("HTTPS://WWW.Example.COM:8080/A/B", "https://www.example.com:8080/A/B"),
    # fragment stripped, including a '?' hiding inside the fragment
    ("https://e.com/p#f?utm_source=x", "https://e.com/p"),
    # sole utm param: the '?' goes with it
    ("https://e.com/p?utm_source=feed", "https://e.com/p"),
    # consecutive utm params both stripped
    ("https://e.com/p?utm_a=1&utm_b=2", "https://e.com/p"),
    # utm between kept params: separators stay well-formed
    ("https://e.com/p?keep=1&utm_campaign=z&also=2",
     "https://e.com/p?keep=1&also=2"),
    # leading utm before a kept param
    ("https://e.com/p?utm_x=1&ref=r", "https://e.com/p?ref=r"),
    # trailing slash before query collapses into the '?'
    ("https://e.com/p/?ref=1&utm_medium=email", "https://e.com/p?ref=1"),
    # plain trailing slash (and multiples) stripped
    ("https://e.com/p///", "https://e.com/p"),
    # host-only trailing slash stripped too (deliberate: one rule, applied
    # uniformly — both spellings collapse)
    ("https://e.com/", "https://e.com"),
    # dangling '?' / '&' stripped
    ("https://e.com/p?", "https://e.com/p"),
    ("https://e.com/p?a=1&", "https://e.com/p?a=1"),
    # schemeless URL passes through the prefix step unchanged
    ("e.com/p/?utm_x=1", "e.com/p"),
    # a param merely CONTAINING 'utm_' mid-value is NOT a tracking param
    ("https://e.com/p?x=utm_decoy&keep=1", "https://e.com/p?x=utm_decoy&keep=1"),
    # empty fragment
    ("https://e.com/p#", "https://e.com/p"),
]


@pytest.fixture(scope="module")
def canon_pairs(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    rows = df.select(
        "url", canonical_url_expr(F.col("url")).alias("canon")
    ).collect()
    return {r.url: r.canon for r in rows}


def test_spark_canonicalization_golden(canon_pairs):
    for raw, want in CASES:
        assert canon_pairs[raw] == want, (raw, canon_pairs[raw], want)


def test_duckdb_canonicalization_matches_spark(canon_pairs):
    con = duckdb.connect()
    for raw, want in CASES:
        # the canonicalization SQL references its input expression several
        # times (the prefix step embeds it twice), so inline a quoted
        # literal instead of a positional parameter
        lit = "'" + raw.replace("'", "''") + "'"
        got = con.execute(f"SELECT {canonical_url_sql(lit)}").fetchone()[0]
        assert got == want, (raw, got, want)
    con.close()


def test_cross_dialect_fuzz_and_idempotence(spark):
    """The canonicalizer lives in two regex dialects (Java / RE2) — fuzz
    URL-shaped strings through BOTH engines in one batch and require
    byte-equality, plus idempotence (canonicalizing a canonical URL is a
    no-op): the two properties that catch dialect drift and
    order-of-steps bugs that hand-picked goldens miss."""
    import random

    rng = random.Random(20260817)
    frags = ["https://", "HTTP://", "//", "", "Example.COM", "a.b", ":81",
             "/p", "/P/q", "?", "&", "#", "utm_", "utm_a=1", "ref=2",
             "x=utm_decoy", "=", "/", "//", "...", "%20", "~u", "a b"]
    urls = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 8)))
            for _ in range(800)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = [
        (r.url, r.c1, r.c2) for r in df.select(
            "url",
            canonical_url_expr(F.col("url")).alias("c1"),
            canonical_url_expr(canonical_url_expr(F.col("url"))).alias("c2"),
        ).collect()
    ]
    con = duckdb.connect()
    for u, c1, c2 in got_spark:
        lit = "'" + u.replace("'", "''") + "'"
        duck = con.execute(f"SELECT {canonical_url_sql(lit)}").fetchone()[0]
        assert duck == c1, (u, c1, duck)
        assert c2 == c1, ("not idempotent", u, c1, c2)
    con.close()
