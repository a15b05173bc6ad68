"""Pure-Python per-document extraction kernel.

Every module here is dependency-free (stdlib only) and deterministic: the
same ``(url, html_bytes, lang_hint)`` always produces byte-identical output
regardless of parallelism, batch boundaries, or row order. This is the
invariant the north rule checks (byte-identical extracted text per url).

The kernel is the web-graft of the reference's per-document pipeline
(``/root/reference/src/martial_arts_ocr/ocr/processor.py:97-196``): the
decision *structure* (multi-detector proposal → text-likeness scoring →
dual-engine consensus → ordered cleanup chain → script/romanization →
reading-order assembly) is preserved; the features are DOM/text features
instead of pixel features.
"""

from .pipeline import extract_document  # noqa: F401
