"""Golden-document byte-identity oracle (FIXTURES.md §2).

``tests/golden_pages.json`` holds the expected extraction output for the
first 40 seeded fixture pages — regenerated ONLY by the seeded generator
script (see file header in git history), never by the engine under test.
Mirrors the reference's exact-assertion tests
(``/root/reference/tests/test_ocr_cleanup_chain.py:53-63``).

The Spark-path equivalence test in test_spark_integration.py extends this
oracle to the distributed path; here the kernel is checked directly so a
kernel regression is attributable without Spark in the loop.
"""

import json
import pathlib

import pytest

from martial_arts_ocr_spark.fixtures.gen_pages import make_html
from martial_arts_ocr_spark.kernel.pipeline import extract_document

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden_pages.json").read_text(
        encoding="utf-8"
    )
)


@pytest.mark.parametrize("rec", GOLDEN, ids=lambda r: r["url"].rsplit("/")[-1])
def test_golden_byte_identity(rec):
    i = int(rec["url"].rsplit("-", 1)[1])
    page = make_html(i)
    assert page["url"] == rec["url"]
    row = extract_document(page["url"], page["html"], page["lang"])
    assert row["status"] == rec["expected_status"]
    assert row["encoding"] == rec["expected_encoding"]
    assert row["text"] == rec["expected_text"]          # byte identity
    assert row["n_blocks"] == rec["expected_blocks"]
    assert row["romaji"] == rec["expected_romaji"]
    assert row["translation"] == rec["expected_translation"]
    assert row["segments"] == rec["expected_lang_segments"]
    assert [
        {"term": t["term"], "pos": t["pos"]} for t in row["term_hits"]
    ] == rec["expected_term_hits"]
    assert [
        {"observed": m["observed"], "candidate": m["candidate"],
         "span": [m["start"], m["end"]]}
        for m in row["macron_candidates"]
    ] == rec["expected_macron_candidates"]
    assert [
        {"region_id": f["region_id"], "caption": f["caption"]}
        for f in row["figures"]
    ] == rec["expected_figures"]
