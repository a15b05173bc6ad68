"""Deterministic linear quality classifier over the embeddings table.

Third production filter family for corpus curation (after the rule-based
Gopher gates and the statistical char-bigram LM filter): a lightweight
learned classifier over document embeddings, the fasttext-style scorer
used by CCNet/GPT-3-lineage pipelines. The reference's closest analogue
is its per-result confidence scoring feeding keep/flag/drop decisions
(reference src/martial_arts_ocr/ocr/processor.py: per-candidate
confidence -> threshold ladder); here the score is a learned linear
functional of the embedding instead of an OCR engine confidence.

Determinism contract (the round-4 cross-engine rule: exact-IEEE ops
only, no transcendentals):

* the fit (full-batch logistic regression, zero init, fixed LR and
  iteration count, float64) runs OFFLINE in
  ``scripts/regen_emb_classifier.py`` against the fixed sf0.001
  embeddings fixture; its sigmoid/exp never appears at query time;
* the learned weights are quantized to ``WEIGHT_DECIMALS`` decimals and
  BAKED below — both engines parse the same decimal literals to the
  same doubles;
* scoring is a pure affine form ``round(bias + sum_i w_i * e_i,
  SCORE_DECIMALS)`` — double multiplies and adds only. Spark folds
  left-to-right (``aggregate(zip_with(...))``); DuckDB sums via
  ``list_dot_product``. Sum-order noise is ~1e-14 while the nearest
  rounding tie across all three SF fixtures is >= 1e-11 away
  (pinned in tests/test_oracle_margins.py), so the rounded score is
  bit-identical cross-engine;
* bucket thresholds compare the rounded score against decimal-literal
  constants in logit space (no sigmoid needed: ``p >= s(t)`` iff
  ``score >= t``).

100 TB shape: scoring is map-only column algebra fused into the
embeddings scan (weights ride in the plan as literals — nothing is
shuffled or broadcast); the keep-set gate consumes it as a small-side
equi-join on the document key.
"""
from __future__ import annotations

POSITIVE_LABELS = frozenset(range(5))   # fixture labels 0-4 = "quality"
N_ITERS = 400
LR = 0.5
WEIGHT_DECIMALS = 7
SCORE_DECIMALS = 6

# logit-space bucket thresholds (decimal literals, representable
# identically in both engines; margins pinned in test_oracle_margins)
THRESH_KEEP = 0.05     # rounded score >= THRESH_KEEP        -> 'keep'
THRESH_DROP = -0.45    # rounded score <  THRESH_DROP        -> 'drop'
                       # otherwise                            -> 'flag'

FIT_FIXTURE = "/root/testdata/sf0.001/embeddings.parquet"

# Baked by scripts/regen_emb_classifier.py --write (do not edit by hand).
BIAS: float = -0.0394772
WEIGHTS: list[float] = [
    -0.0224908, 0.2073268, -0.0873418, -0.1828819,
    0.471729, -0.2359226, 0.2159162, 0.232403,
    -0.5389661, 0.426964, 0.2364298, 0.2503954,
    -0.5699124, 0.0442491, 0.1202761, -0.1970205,
    -0.3344029, -0.3461183, 0.1680077, 0.1492739,
    -0.4147591, -0.2906514, -0.356794, -0.8301661,
    0.3155319, 0.1089862, -0.6789906, 0.0600937,
    -0.1979179, 0.2925483, -0.0298863, 0.3246289,
    0.6665037, 0.1957371, -0.4421591, -0.1568841,
    0.0505217, -0.1723108, -0.6059179, -0.1571998,
    -0.1007198, -0.2268371, 0.070429, 0.1207947,
    0.0882518, 0.3056513, 0.8750245, -0.0284954,
    -0.2541485, 0.4235676, -0.4495705, -0.3302463,
    0.3520073, -0.016091, 0.4955982, 0.3368565,
    -0.2750273, -0.0476897, -0.1351357, 0.5061749,
    -0.1295444, 0.3009177, 0.4547281, -0.114774,
]


def fit_linear(X, y):
    """Deterministic full-batch logistic-regression fit (float64, zero
    init, fixed LR/iterations — no RNG anywhere), quantized to
    WEIGHT_DECIMALS. Returns (weights: list[float], bias: float).

    Used only by the regen script and the freshness-guard test; query
    paths read the baked literals above.
    """
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = np.zeros(X.shape[1], dtype=np.float64)
    b = 0.0
    for _ in range(N_ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (X.T @ g) / len(y)
        b -= LR * float(g.mean())
    return [round(float(x), WEIGHT_DECIMALS) for x in w], round(b, WEIGHT_DECIMALS)


def np_scores(X):
    """Raw (unrounded) affine scores with Spark's exact fold order: a
    strict left-to-right accumulation over dimensions, then + bias —
    mirrors ``aggregate(zip_with(embedding, W), 0.0, acc + w*e)`` term
    for term so tests can compare bit-identically, unlike ``np.dot``
    (pairwise/SIMD summation order)."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    s = np.zeros(len(X), dtype=np.float64)
    for i, w in enumerate(WEIGHTS):
        s = s + X[:, i] * w
    return s + BIAS


def bucket_of(score_rounded: float) -> str:
    if score_rounded >= THRESH_KEEP:
        return "keep"
    if score_rounded < THRESH_DROP:
        return "drop"
    return "flag"
