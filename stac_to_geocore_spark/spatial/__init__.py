from stac_to_geocore_spark.spatial.cover import adaptive_res, cover_bbox_np, covers_df
from stac_to_geocore_spark.spatial.pip import pip_join
from stac_to_geocore_spark.spatial.knn import knn_join

__all__ = ["adaptive_res", "cover_bbox_np", "covers_df", "pip_join", "knn_join"]
