"""Table IO seam — format-agnostic reader/writer for the engine's
durable tables (SURVEY.md §1.3: the reference's disk-persistent ``pt-*``
KVS tables map to Iceberg tables per BASELINE.json input_hint; scratch
tables map to cached DataFrames).

Everything above this seam is format-agnostic: swap ``format="iceberg"``
in (requires the iceberg-spark runtime jar + a catalog, neither shipped
in this sandbox) and the engine's logic is unchanged.  Parquet is the
tested default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Minimal catalog: named tables under a root (parquet) or a Spark
    catalog namespace (iceberg)."""

    def __init__(self, spark: SparkSession, root: str, format: str = "parquet"):
        if format == "iceberg" and not iceberg_available(spark):
            raise RuntimeError(
                "iceberg runtime jar not on the classpath; use format='parquet'"
            )
        self.spark = spark
        self.root = root
        self.format = format

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        if self.format == "iceberg":
            writer = df.writeTo(f"{self.root}.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.format == "iceberg":
            return self.spark.read.table(f"{self.root}.{name}")
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.format == "iceberg":
            return self.spark.catalog.tableExists(f"{self.root}.{name}")
        return os.path.exists(self._path(name))

    def rename(self, old: str, new: str) -> None:
        """KVS rename-table parity (``kvs/KVSClient.java:225-251``)."""
        if self.format == "iceberg":
            self.spark.sql(f"ALTER TABLE {self.root}.{old} RENAME TO {self.root}.{new}")
            return
        os.rename(self._path(old), self._path(new))

    def upsert(self, updates: DataFrame, name: str, key: str | list[str]) -> None:
        """KVS point-write parity (``kvs/KVSClient.java:253-318`` put →
        row upsert): MERGE semantics keyed on ``key`` — matching rows
        are replaced by the update, non-matching update rows are
        inserted, untouched base rows survive.

        Iceberg: a real ``MERGE INTO`` (row-level ops, transactional —
        the path for concurrent readers).  Parquet fallback:
        copy-on-write — base anti-join updates ∪ updates into a staging
        dir, then a rename swap (old → trash, staged → live, trash
        removed).  The swap is two POSIX renames, not a transaction: a
        crash between them leaves the table briefly absent but both
        copies recoverable on disk (trash + staged), never silently
        lost.  Both paths are one shuffle on the key; at 10^12 rows the
        Iceberg path additionally prunes untouched files by key range."""
        keys = [key] if isinstance(key, str) else list(key)
        if self.format == "iceberg":
            updates.createOrReplaceTempView("_upsert_src")
            on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            self.spark.sql(
                f"MERGE INTO {self.root}.{name} t USING _upsert_src s ON {on} "
                "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
            )
            return
        base = self.read(name)
        merged = base.join(updates.select(*keys), keys, "left_anti").unionByName(
            updates.select(*base.columns)
        )
        import shutil

        staged = self._path(f"_staging_{name}")
        trash = self._path(f"_trash_{name}")
        merged.write.mode("overwrite").parquet(staged)
        shutil.rmtree(trash, ignore_errors=True)
        live = self._path(name)
        if os.path.exists(live):
            os.rename(live, trash)
        os.rename(staged, live)
        shutil.rmtree(trash, ignore_errors=True)

    def drop(self, name: str) -> None:
        """FlameRDD.destroy parity (``flame/FlameRDD.java:50-56``)."""
        if self.format == "iceberg":
            self.spark.sql(f"DROP TABLE IF EXISTS {self.root}.{name}")
            return
        import shutil

        shutil.rmtree(self._path(name), ignore_errors=True)
