"""Resumable ledger-driven execution (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

The reference has no resume story — its unit of work is a tile window
written under a lock (SURVEY §2.8). The distributed design:

- Work is keyed by an explicit partition column (the tile/cell id).
- Each run appends, per completed partition: output rows (under
  ``out/part_key=...``) and ONE ledger row
  ``(part_key, run_id, input_fingerprint, n_rows, checksum, wall_ms,
  finished_at)`` — the lineage + metrics record.
- Resume = LEFT ANTI JOIN of the work-list against the ledger: completed
  partitions are skipped entirely (their input is not even scanned when
  the source is partition-pruned on the same key).
- Writes are idempotent: output goes to a per-partition directory named
  by the partition key; a re-run of an unfinished partition overwrites
  (dynamic partition overwrite), so a crash between output write and
  ledger append re-does exactly that partition and converges.

On Iceberg the ledger role is played by snapshot metadata + an append-only
metrics table; parquet directories stand in here (no Iceberg jar in the
sandbox) with identical semantics.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

LEDGER_SCHEMA = (
    "part_key long, run_id string, input_fingerprint long, n_rows long, "
    "checksum long, wall_ms long, finished_at double"
)


class LedgerJob:
    """Resumable batch job over an explicitly partitioned work-list."""

    def __init__(self, spark: SparkSession, root: str, part_col: str = "cell"):
        self.spark = spark
        self.root = root
        self.part_col = part_col
        self.out_dir = os.path.join(root, "out")
        self.ledger_dir = os.path.join(root, "ledger")

    # -- ledger ------------------------------------------------------------
    def ledger(self) -> DataFrame:
        if not os.path.exists(self.ledger_dir):
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.parquet(self.ledger_dir)

    def completed_keys(self) -> DataFrame:
        return self.ledger().select(
            F.col("part_key").alias(self.part_col)
        ).distinct()

    # -- run ---------------------------------------------------------------
    def run(self, data: DataFrame, hash_col, max_partitions: int | None = None) -> dict:
        """Process all partitions not yet in the ledger.

        ``data`` must contain ``part_col``; ``hash_col`` is the per-row
        hash Column for the order-independent partition checksum.
        ``max_partitions`` simulates a crash after N partitions (tests).
        Returns run metrics.
        """
        run_id = uuid.uuid4().hex[:12]
        pending = data.join(
            self.completed_keys(), self.part_col, "left_anti"
        )
        t0 = time.perf_counter()
        # one pass: per-partition aggregation (rows + checksum + payload)
        agg = (
            pending.withColumn("_h", hash_col)
            .groupBy(self.part_col)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("_h").alias("checksum"),
            )
        )
        rows = agg.collect()
        if max_partitions is not None:
            rows = rows[:max_partitions]
        done_keys = [r[self.part_col] for r in rows]
        if done_keys:
            # idempotent per-partition output (dynamic overwrite by key)
            out = pending.where(F.col(self.part_col).isin(done_keys))
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(self.part_col)
                .parquet(self.out_dir)
            )
            wall_ms = int((time.perf_counter() - t0) * 1000)
            ledger_rows = [
                (
                    int(r[self.part_col]),
                    run_id,
                    int(r["n_rows"]),  # fingerprint: input row count
                    int(r["n_rows"]),
                    int(r["checksum"]),
                    wall_ms,
                    time.time(),
                )
                for r in rows
            ]
            self.spark.createDataFrame(ledger_rows, LEDGER_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(self.ledger_dir)
        return {
            "run_id": run_id,
            "partitions_processed": len(done_keys),
            "rows_processed": int(sum(r["n_rows"] for r in rows)),
        }

    def metrics(self) -> DataFrame:
        """Per-partition lineage + metrics view."""
        return self.ledger().orderBy("part_key")
