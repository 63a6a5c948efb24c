from execute_sync_spark.plans.workload import QUERIES, ORACLES, flagship  # noqa: F401
