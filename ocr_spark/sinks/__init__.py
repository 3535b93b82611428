from ocr_spark.sinks.writers import write_extracted, write_lineage  # noqa: F401
