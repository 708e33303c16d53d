from webloghunter_spark.streaming.sessions import (  # noqa: F401
    sessionize_stream,
    windowed_counts_stream,
)
