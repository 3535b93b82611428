from ocr_spark.streaming.extract_stream import (  # noqa: F401
    run_extract_stream,
    stream_transcripts,
)
