from webloghunter_spark.detectors.burst import burst_success_detector  # noqa: F401
from webloghunter_spark.detectors.tools import tool_scanner  # noqa: F401
