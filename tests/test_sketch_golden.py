"""Golden pins for the MinHash/SimHash sketch values.

These values were computed with the round-1 reference implementation
(per-row Python loops) BEFORE the numpy vectorization; the vectorized
kernels must reproduce them bit-for-bit. Analogue of the reference's
exact-assert style (/root/reference/tests/test_ocr_cleanup_chain.py:26-63).
"""

import pandas as pd

from martial_arts_ocr_spark.queries.similarity import (
    minhash_signatures_batch,
    simhash_batch,
)

_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "hi",
    "one two",
    "  padded   spacing   between tokens here  ",
    "repeat repeat repeat repeat repeat",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "",
]

_GOLDEN_MH0 = [311114726888026710, 177713581588473209, 164580316877956999,
               567769631401275037, 733399259003685399, 389473941680762769,
               447952275153992774, 103217610386181827, 83570988878250156,
               394030127324212772, 413710503994796620, 47153065683121488,
               857830128101007571, 217579606318565169, 83385740341633992,
               291254382534071481, 196427842685143070, 508776332420051769,
               386968405287534294, 74095830616689523, 49242338260416075,
               421897485393881185, 726537210023837737, 469951052035845071,
               236252084169063100, 122115106569221233, 747020286257424035,
               370212541332914518, 84029024159142091, 583867958465219352,
               199003622706801872, 171726777545015277]

_GOLDEN_MH1_FIRST4 = [1701996375321795498, 1348193245264219550,
                      1468517999197116122, 835798975801485302]

_GOLDEN_SH = [4910625387521299471, 3237124428870121033, 1246110131605022904,
              418430851289240364, 7544277269799096114, 6098072089766709123, 0]


def test_minhash_golden():
    sigs = minhash_signatures_batch(pd.Series(_TEXTS))
    assert list(sigs.iloc[0]) == _GOLDEN_MH0
    assert list(sigs.iloc[1])[:4] == _GOLDEN_MH1_FIRST4
    assert all(len(s) == 32 for s in sigs)


def test_simhash_golden():
    out = simhash_batch(pd.Series(_TEXTS))
    assert list(out) == _GOLDEN_SH


def test_simhash_batch_order_invariance():
    """Values must not depend on batch composition or position."""
    rev = simhash_batch(pd.Series(list(reversed(_TEXTS))))
    assert list(rev) == list(reversed(_GOLDEN_SH))
    solo = simhash_batch(pd.Series([_TEXTS[3]]))
    assert solo.iloc[0] == _GOLDEN_SH[3]


def test_band_keys_group_equivalently_to_string_bands():
    """The FNV-folded band keys must induce exactly the banding the
    round-1 string keys did: docs agree on band key b iff their signature
    rows for band b are all equal."""
    from martial_arts_ocr_spark.queries.similarity import (
        _MINHASH_BANDS, minhash_band_keys_batch)

    texts = _TEXTS + [_TEXTS[0], _TEXTS[3], "the quick brown fox jumps over"]
    sigs = minhash_signatures_batch(pd.Series(texts))
    keys = minhash_band_keys_batch(pd.Series(texts))
    rows = 32 // _MINHASH_BANDS
    for i in range(len(texts)):
        for j in range(len(texts)):
            for b in range(_MINHASH_BANDS):
                same_sig = (sigs[i][b * rows:(b + 1) * rows]
                            == sigs[j][b * rows:(b + 1) * rows])
                same_key = keys[i][b] == keys[j][b]
                assert same_sig == same_key, (i, j, b)


def test_minhash_batch_order_invariance():
    rev = minhash_signatures_batch(pd.Series(list(reversed(_TEXTS))))
    assert list(rev.iloc[-1]) == _GOLDEN_MH0
    solo = minhash_signatures_batch(pd.Series([_TEXTS[0]]))
    assert list(solo.iloc[0]) == _GOLDEN_MH0


def test_simhash_oracle_empty_doc_row():
    """Empty/whitespace-only docs: simhash_batch emits 0; the SQL oracle
    must produce the same row instead of dropping the doc (round-2 ADVICE
    item — latent row-count mismatch)."""
    import duckdb
    import pandas as pd

    from martial_arts_ocr_spark.queries.similarity import (
        _simhash_sql_ctes,
        simhash_batch,
    )

    texts = ["", "   ", "alpha beta", "\t"]
    py = list(simhash_batch(pd.Series(texts)))
    con = duckdb.connect()
    con.execute("CREATE TABLE probe(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO probe VALUES (?, ?)",
                    list(enumerate(texts)))
    sql = (f"WITH {_simhash_sql_ctes('SELECT doc_id, text FROM probe')} "
           "SELECT doc_id, simhash FROM simhashed ORDER BY doc_id")
    rows = con.execute(sql).fetchall()
    con.close()
    assert [r[0] for r in rows] == [0, 1, 2, 3]
    assert [r[1] for r in rows] == [int(v) for v in py]
