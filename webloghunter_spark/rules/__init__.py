from webloghunter_spark.rules.sigma import (  # noqa: F401
    DEFAULT_RULES,
    apply_rules,
    compile_selection,
    load_rules,
)
