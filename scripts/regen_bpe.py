"""Regenerate (or verify) the baked BPE merge table in
martial_arts_ocr_spark/bpe.py from the fixed sf0.001 fixture corpus.

Usage:
    python scripts/regen_bpe.py            # verify literal is current
    python scripts/regen_bpe.py --write    # rewrite the literal in place

Also asserts PRETOKEN_RE matches queries/textops.py's stage-1 pattern
(kept separately to avoid an import cycle)."""

import re
import sys

sys.path.insert(0, "/root/repo")

from martial_arts_ocr_spark import bpe                      # noqa: E402
from martial_arts_ocr_spark.queries.textops import _BPE_RE  # noqa: E402

CORPUS = "/root/testdata/sf0.001/documents.parquet"


def main() -> None:
    assert bpe.PRETOKEN_RE == _BPE_RE, "pre-tokenizer patterns drifted"
    import duckdb

    con = duckdb.connect()
    texts = [r[0] for r in con.execute(
        f"SELECT text FROM read_parquet('{CORPUS}') ORDER BY doc_id"
    ).fetchall()]
    con.close()
    merges = bpe.train_bpe(texts, bpe.N_MERGES)

    if "--write" in sys.argv:
        path = bpe.__file__
        with open(path, encoding="utf-8") as f:
            src = f.read()
        lines = ",\n".join(f"    {m!r}" for m in merges)
        new_literal = f"BPE_MERGES: list[tuple[str, str]] = [\n{lines},\n]\n"
        src = re.sub(
            r"BPE_MERGES: list\[tuple\[str, str\]\] = \[.*?\]\n",
            new_literal, src, count=1, flags=re.S,
        )
        with open(path, "w", encoding="utf-8") as f:
            f.write(src)
        print(f"wrote {len(merges)} merges to {path}")
    else:
        assert merges == bpe.BPE_MERGES, (
            f"baked table stale: {len(bpe.BPE_MERGES)} baked vs "
            f"{len(merges)} retrained; run with --write")
        print(f"baked table current ({len(merges)} merges)")


if __name__ == "__main__":
    main()
