from stac_to_geocore_spark.compat.translate import (
    translate_collections,
    translate_items,
    translate_root,
)

__all__ = ["translate_collections", "translate_items", "translate_root"]
