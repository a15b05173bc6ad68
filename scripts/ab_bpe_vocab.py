"""Interleaved one-process A/B of the BPE application kernel at 64 vs
1,024 merges over the sf0.1 corpus (round-5 VERDICT item 5: show the
vectorized application's docs/s holds at a realistic vocabulary).

Protocol per CLAUDE.md round-2/3 gotchas: both variants interleave in
ONE process (best-of-N alternating) — sequential before/after pairs on
this box are noise; and the kernel is measured ALONE (the UDF wrapper
adds ~0, measured round 3).

Usage: python scripts/ab_bpe_vocab.py [rounds]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from martial_arts_ocr_spark import bpe                  # noqa: E402
from martial_arts_ocr_spark.bpe_merges_1k import BPE_MERGES_1K  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import duckdb

    con = duckdb.connect()
    texts = [r[0] for r in con.execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()]
    con.close()

    variants = {
        "64": bpe.merge_ranks(bpe.BPE_MERGES),
        "1k": bpe.merge_ranks(BPE_MERGES_1K),
    }

    def run(ranks):
        cache: dict = {}     # fresh per rep, same as a fresh Arrow batch
        t0 = time.perf_counter()
        total = 0
        for t in texts:
            total += bpe.doc_token_count(t, ranks, cache)
        return time.perf_counter() - t0, total

    # warm both code paths once before timing
    for ranks in variants.values():
        run(ranks)

    best = {k: float("inf") for k in variants}
    totals = {}
    for _ in range(rounds):
        for k, ranks in variants.items():      # alternate within a round
            dt, tot = run(ranks)
            best[k] = min(best[k], dt)
            totals[k] = tot
    n = len(texts)
    for k in variants:
        print(f"{k}: best {best[k]:.3f}s = {n / best[k]:.0f} docs/s "
              f"({totals[k]} tokens)")
    print(f"1k/64 wall ratio: {best['1k'] / best['64']:.3f}")


if __name__ == "__main__":
    main()
