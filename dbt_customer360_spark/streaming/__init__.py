from dbt_customer360_spark.streaming.apply import CDCApplier, replay_batch  # noqa: F401
