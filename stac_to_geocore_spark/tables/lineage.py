"""Per-partition lineage checkpointing with kill/resume (Iceberg-style).

Generalizes the reference's run manifest: stac-to-geocore appends every
written key to lastRun.txt (app.py:69,116,135,162,164) and deletes the
previous run's keys before writing (s3_operations.py:31-43) — a crude,
non-atomic lineage mechanism. Here each *partition* (a cell-prefix bucket)
commits independently with (cell_range, row_count, checksum, elapsed,
rows/sec), so a killed job resumes by skipping committed partitions —
BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics".

Commit protocol (two-phase, local-fs rename as the atomic swap; on a real
cluster the same protocol rides Iceberg's snapshot commit via
iceberg-spark-runtime — SURVEY.md §7.0):

  1. stage:  write the batch of partitions to  <path>/.staging-<run>/
  2. swap:   os.rename each partition dir into <path>/data/<part>=<v>/
  3. commit: append one manifest JSON line per partition

A crash between (2) and (3) leaves renamed data without a manifest row; the
next run detects the orphan dir and re-swaps/overwrites it (write is
idempotent per partition), so resume is exactly-once per partition.

The checksum is an order-independent XOR of xxhash64 over the row's columns,
computed by the JVM (F.xxhash64 + bit_xor) — no Python in the data path.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_manifest(path: str) -> list[dict]:
    mf = os.path.join(path, "_lineage", "manifest.jsonl")
    if not os.path.exists(mf):
        return []
    with open(mf) as f:
        return [json.loads(line) for line in f if line.strip()]


class LineageWriter:
    """Writes a DataFrame partitioned by `partition_col` with per-partition
    lineage rows and resume-on-restart."""

    def __init__(self, path: str, partition_col: str = "cell_p5"):
        self.path = path
        self.partition_col = partition_col
        self.data_dir = os.path.join(path, "data")
        self.manifest_path = os.path.join(path, "_lineage", "manifest.jsonl")

    def completed_partitions(self) -> set:
        return {m["partition"] for m in read_manifest(self.path) if m.get("status") == "committed"}

    def write(
        self,
        df: DataFrame,
        run_id: str = "run",
        batch_size: int | None = None,
        fail_after_batches: int | None = None,
    ) -> list[dict]:
        """Write all not-yet-committed partitions of df.

        batch_size: partitions per commit batch (None = all pending in one
        batch). fail_after_batches: test hook — raise after N committed
        batches to simulate a kill.
        """
        pc = self.partition_col
        os.makedirs(os.path.dirname(self.manifest_path), exist_ok=True)
        done = self.completed_partitions()

        df = df.persist()
        try:
            # collects only the DISTINCT partition-key list: the key is a
            # coarse cell prefix (e.g. h3 res-5 parent) by design, so its
            # cardinality is bounded by the cell vocabulary (~10^4-10^5 at
            # planetary coverage), not by the row count — driver-safe at
            # 100 TB. A caller partitioning by a high-cardinality key would
            # also produce that many commit batches, which is the real
            # misuse; the collect is not the binding constraint.
            all_parts = [r[0] for r in df.select(pc).distinct().collect()]
            pending = sorted(str(p) for p in all_parts if str(p) not in done)
            batches = (
                [pending]
                if batch_size is None
                else [pending[i : i + batch_size] for i in range(0, len(pending), batch_size)]
            )
            written: list[dict] = []
            for bi, batch in enumerate(batches):
                if fail_after_batches is not None and bi >= fail_after_batches:
                    raise RuntimeError(f"injected failure before batch {bi}")
                t0 = time.monotonic()
                bdf = df.filter(F.col(pc).cast("string").isin(batch))
                # per-partition stats ride the same cached data
                range_col = "cell" if "cell" in df.columns else pc
                hash_cols = [c for c in df.columns]
                stats = (
                    bdf.groupBy(F.col(pc).cast("string").alias("p"))
                    .agg(
                        F.count(F.lit(1)).alias("row_count"),
                        F.expr(
                            "bit_xor(" + "xxhash64(" + ", ".join(hash_cols) + "))"
                        ).alias("checksum"),
                        F.min(range_col).alias("range_lo"),
                        F.max(range_col).alias("range_hi"),
                    )
                    .collect()
                )
                staging = os.path.join(self.path, f".staging-{run_id}-{bi}")
                bdf.write.mode("overwrite").partitionBy(pc).parquet(staging)
                elapsed = time.monotonic() - t0
                total_rows = sum(s["row_count"] for s in stats)
                os.makedirs(self.data_dir, exist_ok=True)
                for s in stats:
                    src = os.path.join(staging, f"{pc}={s['p']}")
                    dst = os.path.join(self.data_dir, f"{pc}={s['p']}")
                    if os.path.exists(dst):
                        shutil.rmtree(dst)  # orphan from a crash between swap+commit
                    os.rename(src, dst)
                shutil.rmtree(staging, ignore_errors=True)
                with open(self.manifest_path, "a") as mf:
                    for s in stats:
                        share = elapsed * (s["row_count"] / total_rows) if total_rows else 0.0
                        row = {
                            "run_id": run_id,
                            "partition": s["p"],
                            "row_count": s["row_count"],
                            "checksum": int(s["checksum"]) if s["checksum"] is not None else 0,
                            "cell_range": [
                                str(s["range_lo"]),
                                str(s["range_hi"]),
                            ],
                            "elapsed_sec": round(share, 4),
                            "rows_per_sec": round(s["row_count"] / share, 2) if share > 0 else None,
                            "status": "committed",
                        }
                        mf.write(json.dumps(row) + "\n")
                        written.append(row)
            return written
        finally:
            df.unpersist()

    def read(self, spark) -> DataFrame:
        return spark.read.option("basePath", self.data_dir).parquet(self.data_dir)
