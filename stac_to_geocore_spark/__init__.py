"""stac_to_geocore_spark — a PySpark-native spatial-join + tiling engine.

Brand-new engine (NOT a port) with the query semantics of
Canadian-Geospatial-Platform/stac-to-geocore (reference at /root/reference,
read-only), extended per BASELINE.json's north star:

- H3-style / S2 cell encoding of lat/lon (vectorized pandas UDFs, pure numpy)
- z/x/y Web-Mercator tile assignment (pure column math, no UDF)
- cell-bucketed point-in-polygon joins (broadcast or sort-merge, filter+refine)
- kNN via cell-ring expansion
- per-partition lineage checkpointing with kill/resume
- byte-exact STAC -> GeoCore translation (compat layer)
- training-data ops: dedup (exact/minhash/simhash), ANN similarity search,
  text quality / language-id / token stats, image codec plumbing

Everything is DataFrame-first: logical plans are declared with pyspark.sql
and Catalyst/AQE picks physical strategies; Python appears only inside
Arrow-batched pandas UDFs (never per-row UDFs).
"""

__version__ = "0.1.0"
