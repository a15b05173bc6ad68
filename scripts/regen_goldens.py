"""Regenerate tests/golden_pages.json from the seeded fixture generator.

THE ONLY sanctioned way to update the golden byte-identity oracle
(CLAUDE.md invariant): run this script after an INTENTIONAL kernel or
fixture-generator semantics change, inspect `git diff tests/golden_pages.json`
to confirm only the intended pages/fields moved, and commit the diff
together with the change that caused it.

Usage: python scripts/regen_goldens.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from martial_arts_ocr_spark.fixtures.gen_pages import make_html  # noqa: E402
from martial_arts_ocr_spark.kernel.pipeline import extract_document  # noqa: E402

N_GOLDEN = 40
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden_pages.json"


def record(i: int) -> dict:
    page = make_html(i)
    row = extract_document(page["url"], page["html"], page["lang"])
    return {
        "url": page["url"],
        "expected_text": row["text"],
        "expected_lang_segments": row["segments"],
        "expected_romaji": row["romaji"],
        "expected_translation": row["translation"],
        "expected_blocks": row["n_blocks"],
        "expected_figures": [
            {"region_id": f["region_id"], "caption": f["caption"]}
            for f in row["figures"]
        ],
        "expected_term_hits": [
            {"term": t["term"], "pos": t["pos"]} for t in row["term_hits"]
        ],
        "expected_macron_candidates": [
            {"observed": m["observed"], "candidate": m["candidate"],
             "span": [m["start"], m["end"]]}
            for m in row["macron_candidates"]
        ],
        "expected_encoding": row["encoding"],
        "expected_status": row["status"],
    }


def main() -> None:
    recs = [record(i) for i in range(N_GOLDEN)]
    OUT.write_text(
        json.dumps(recs, ensure_ascii=False, indent=1) + "\n",
        encoding="utf-8",
    )
    print(f"wrote {len(recs)} golden records to {OUT}")


if __name__ == "__main__":
    main()
