"""Distributed page synthesis must be byte-identical to driver-side
generation (pure function of (index, seed)) and partition-count invariant."""

from martial_arts_ocr_spark.fixtures.gen_pages import generate_pages, pages_spark


def test_pages_spark_matches_driver_generation(spark):
    ref = {r["url"]: r for r in generate_pages(50)}
    got = {r.url: r for r in pages_spark(spark, 50, partitions=7).collect()}
    assert set(got) == set(ref)
    for url, r in ref.items():
        g = got[url]
        assert bytes(g.html) == r["html"], url
        assert g.lang == r["lang"]
        assert g.warc_ts == r["warc_ts"]


def test_pages_spark_partition_invariant(spark):
    a = {r.url: bytes(r.html)
         for r in pages_spark(spark, 30, partitions=2).collect()}
    b = {r.url: bytes(r.html)
         for r in pages_spark(spark, 30, partitions=13).collect()}
    assert a == b


def test_driver_corpus_oracle_preconditions():
    """The template-page oracles (extract_*/run_metrics/host_profiles)
    model the 600-char chunk split with pure length arithmetic, which is
    only exact when the text has no newlines ('.{600}' doesn't cross \\n)
    — pin that corpus property at every SF (round-2 ADVICE item)."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n_bad, n_empty = con.execute(
            f"""SELECT sum(CASE WHEN regexp_matches(text, '[\\n\\r]')
                              THEN 1 ELSE 0 END),
                       sum(CASE WHEN length(trim(text)) = 0
                              THEN 1 ELSE 0 END)
               FROM read_parquet('/root/testdata/{sf}/documents.parquet')"""
        ).fetchone()
        assert n_bad == 0, (sf, n_bad)
        assert n_empty == 0, (sf, n_empty)
        # printable-ASCII only: the sketch UDFs tokenize with Python
        # str.split() (Unicode whitespace) while the oracles use RE2 \s
        # (ASCII) — equivalent ONLY on this corpus class (review-found).
        # This range check (0x20-0x7E) also excludes \x0B vertical tab,
        # which Java \s matches but RE2 \s does NOT — the one character
        # that would silently split whitespace_normalize/doc_trigram_head
        # between Spark and DuckDB (round-4 review)
        n_nonascii = con.execute(
            f"""SELECT sum(CASE WHEN regexp_matches(text, '[^ -~]')
                              THEN 1 ELSE 0 END)
               FROM read_parquet('/root/testdata/{sf}/documents.parquet')"""
        ).fetchone()[0]
        assert n_nonascii == 0, (sf, n_nonascii)
    con.close()
