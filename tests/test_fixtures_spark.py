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
