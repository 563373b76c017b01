from nexusbase_spark.plans.partitioning import spread  # noqa: F401
