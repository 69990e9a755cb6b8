from dbt_customer360_spark.lake.table import LakeTable  # noqa: F401
