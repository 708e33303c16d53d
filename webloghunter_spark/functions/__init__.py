from webloghunter_spark.functions.risk import (  # noqa: F401
    method_risk_expr,
    status_risk_expr,
    uri_risk_udf,
)
from webloghunter_spark.functions.cidr import ip_in_cidr  # noqa: F401
