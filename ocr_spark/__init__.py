"""ocr_spark — a PySpark-native main-content extraction engine.

Generalizes the dataflow of the reference OCR pipeline
(/root/reference/handwriting/predict.py) from pixels to transcript text:
adaptive-threshold segmentation, geometric gating, Otsu-split scoring,
confidence-gated classification, connected-span merging, and ordered
emission — re-expressed as an idiomatic Spark DataFrame pipeline with
Arrow-vectorized pandas UDFs (never per-row Python UDFs).

Layout:
  extract/    pure NumPy/pandas per-turn extraction math (THE oracle)
  operators/  Spark operators: extraction mapInPandas, dedup, similarity
  functions/  scalar pandas_udfs + Column helpers
  sources/    readers (parquet; Iceberg behind import-try) + synth transcripts
  plans/      job composition: bucket/salt/resume/lineage/ordering
  streaming/  Structured Streaming wrapper (foreachBatch extraction)
"""

__version__ = "0.1.0"
