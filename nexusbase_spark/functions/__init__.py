from nexusbase_spark.functions.fidelity import (  # noqa: F401
    AggSpec,
    build_agg_exprs,
    parse_agg_func,
)
