from webloghunter_spark.operators.sessionize import sessionize  # noqa: F401
from webloghunter_spark.operators.counts import with_request_count  # noqa: F401
from webloghunter_spark.operators.dedup import remove_cross_source_dups  # noqa: F401
from webloghunter_spark.operators.timeutil import with_utc_timestamp  # noqa: F401
