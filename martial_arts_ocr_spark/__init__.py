"""martial_arts_ocr_spark — a from-scratch PySpark-native web-text
extraction engine with the capabilities of ``ljramones/martial_arts_ocr``,
re-targeted from scanned pages to Common-Crawl-style web documents.

Layout
------
``kernel/``   pure-Python per-document extraction semantics (unit-testable
              without Spark; runs vectorized inside Arrow-batched UDFs).
``engine/``   Spark wiring: schemas, mapInPandas job, host-hash
              partitioning + salting, Iceberg-layout catalog emulation,
              checkpoint/resume, per-partition metrics.
``fixtures/`` deterministic seeded synthetic ``pages`` table generator.
``queries/``  relational / text / similarity query surface registered with
              the driver harness in ``__spark_entry__.py``.

Reference parity is documented per-module with ``file:line`` citations into
``/root/reference`` (ljramones/martial_arts_ocr). The architecture is NOT a
port: all execution is DataFrame + Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
