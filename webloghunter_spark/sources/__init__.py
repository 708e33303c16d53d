from webloghunter_spark.sources.logparse import (  # noqa: F401
    LOG_FORMATS,
    parse_lines,
    read_access_logs,
    read_raw_lines,
)
