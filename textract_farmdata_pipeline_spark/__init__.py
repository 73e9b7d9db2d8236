"""textract_farmdata_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``Avani201/textract-farmdata-pipeline`` (an AWS-Lambda
document-ETL for 1860 agricultural-census OCR), extended with the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) that a 100 TB pipeline needs.

Layout
------
- ``functions``  — scalar predicates / parsers (reference F4-F7, P1-P7)
  as Catalyst Column expressions where possible, Python twins for the
  pandas-UDF islands.
- ``operators``  — dataflow operators: layout windows (O1-O7), the
  stateful record-assembly fold (A1), output normalization (A3),
  dedup / similarity / text-analysis extensions.
- ``sources``    — block readers, the (stubbed) Textract connector, sinks.
- ``plans``      — end-to-end pipeline composition.
- ``streaming``  — Structured Streaming variant of the pipeline.
- ``fixtures``   — deterministic, dialect-portable synthetic OCR-line
  generation used by tests and the DuckDB correctness oracles.
"""

__version__ = "0.1.0"
