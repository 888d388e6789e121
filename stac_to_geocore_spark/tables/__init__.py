from stac_to_geocore_spark.tables.lineage import LineageWriter, read_manifest
from stac_to_geocore_spark.tables.snapshots import SnapshotTable

__all__ = ["LineageWriter", "read_manifest", "SnapshotTable"]
