"""Seed-dimension loaders.

The reference ships three CSV seeds (`dbt seed`, README.md:136):
country codes (249 rows), state/territory codes (1677), nicknames
(2672). They are data, copied verbatim into ``seeds/``; at runtime
each becomes a broadcast dimension (SURVEY.md §2.1 S3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEEDS = os.path.join(os.path.dirname(__file__), "..", "seeds")


def _load(spark: SparkSession, name: str) -> DataFrame:
    return spark.read.csv(os.path.join(_SEEDS, name), header=True)


def load_country_codes(spark: SparkSession) -> DataFrame:
    """columns: country_name, alternative_country_name,
    country_code_numeric, country_code_alpha_2, country_code_alpha_3."""
    return F.broadcast(_load(spark, "customer360__country_codes.csv"))


def load_state_codes(spark: SparkSession) -> DataFrame:
    """columns: state_territory, state_code, alpha2_country_code."""
    return F.broadcast(_load(spark, "customer360__state_territory_codes.csv"))


def load_nicknames(spark: SparkSession) -> DataFrame:
    """columns: canonical_name, nickname (many canonicals per nickname
    -> the join fans out and is re-aggregated, int_customer360__stripe.sql:460-467)."""
    return F.broadcast(_load(spark, "customer360__nicknames.csv"))
