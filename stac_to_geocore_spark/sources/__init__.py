from stac_to_geocore_spark.sources.harvest import (
    fetch_items_df,
    harvest,
    http_fetch,
    plan_pages,
)

from stac_to_geocore_spark.sources.stac_source import StacDataSource

__all__ = ["plan_pages", "fetch_items_df", "harvest", "http_fetch", "StacDataSource"]
