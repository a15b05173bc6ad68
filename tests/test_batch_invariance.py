"""Arrow-batch-boundary invariance: extract_batch output must not depend
on how rows are split into batches (the property that makes
maxRecordsPerBatch a pure tuning knob)."""

import pandas as pd

from martial_arts_ocr_spark.engine.job import extract_batch
from martial_arts_ocr_spark.fixtures.gen_pages import pages_pandas


def _run(pdf, batch_size):
    batches = [pdf.iloc[i:i + batch_size] for i in range(0, len(pdf), batch_size)]
    out = pd.concat(list(extract_batch(iter(batches))), ignore_index=True)
    return out.sort_values("url").reset_index(drop=True)


def test_output_invariant_to_batch_split():
    pdf = pages_pandas(60)
    pdf["host"] = pdf["url"].str.extract(r"://([^/]+)")
    a = _run(pdf, 7)
    b = _run(pdf, 60)
    c = _run(pdf.iloc[::-1].reset_index(drop=True), 13)  # row order too
    assert a["text"].tolist() == b["text"].tolist() == c["text"].tolist()
    assert a["confidence"].tolist() == b["confidence"].tolist()
    assert a["romaji"].tolist() == c["romaji"].tolist()
