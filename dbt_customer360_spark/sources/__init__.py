from dbt_customer360_spark.sources.cdc import generate_change_events  # noqa: F401
from dbt_customer360_spark.sources.seeds import (  # noqa: F401
    load_country_codes,
    load_nicknames,
    load_state_codes,
)
