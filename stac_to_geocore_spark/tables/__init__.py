from stac_to_geocore_spark.tables.lineage import LineageWriter, read_manifest

__all__ = ["LineageWriter", "read_manifest"]
