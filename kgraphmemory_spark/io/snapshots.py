"""Snapshot catalog — Iceberg-shaped checkpointing with a parquet+manifest
fallback (the sandbox has no Iceberg jars; the interface is the contract).

Every pipeline stage commits atomically:
1. write data parquet under   <root>/<stage>/data/
2. write lineage parquet under <root>/<stage>/lineage/   (per-partition
   rows: url-bucket, counts, optional link-score histogram json)
3. atomically rename a manifest json into place — the commit point.

Resume: a stage whose manifest exists is read back, not recomputed — a
killed run therefore never reprocesses committed work (north rule:
"resumes from the last committed snapshot").  Manifests carry row counts +
schema for audit, plus the BACKEND the stage data actually lives in.

Iceberg adoption (round 4, SURVEY §7.1): when (a) the Iceberg Spark
runtime is on the classpath AND (b) a catalog name is configured
(``spark.kgm.iceberg.catalog`` conf or ``KGM_ICEBERG_CATALOG`` env),
stage data commits as a real Iceberg table snapshot via
``df.writeTo(<catalog>.<ns>.<stage>).createOrReplace()`` — atomic by
Iceberg's own metadata swap — and reads back through ``spark.table``.
The local manifest json stays either way (it is the resume token and the
audit record; its ``backend``/``table`` fields say where the data is).
This sandbox ships no Iceberg jars, so here ``_iceberg_catalog`` returns
None and every test runs the parquet path; on a jarred cluster the SAME
interface commits snapshots with no caller change.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _iceberg_catalog(spark: SparkSession) -> str | None:
    """Configured Iceberg catalog name, or None → parquet fallback.
    Both the jars AND an explicit catalog opt-in are required — detecting
    jars alone must not silently redirect stage data."""
    name = os.environ.get("KGM_ICEBERG_CATALOG") or \
        spark.conf.get("spark.kgm.iceberg.catalog", None)
    if not name:
        return None
    return name if iceberg_available(spark) else None


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        # identifier-safe namespace derived from the workdir (one run's
        # stages share it, so parallel runs never collide on table names)
        self.namespace = "kgm_" + re.sub(r"\W+", "_", root).strip("_")[-48:]
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self._dir(stage), MANIFEST)

    # -- API ------------------------------------------------------------
    def committed(self, stage: str) -> bool:
        return os.path.exists(self._manifest(stage))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest(stage)) as f:
            return json.load(f)

    def _table(self, catalog: str, stage: str) -> str:
        return f"{catalog}.{self.namespace}.{stage}"

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        if self.committed(stage):
            man = self.manifest(stage)
            if man.get("backend") == "iceberg":
                return spark.table(man["table"])
        return spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def read_lineage(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._dir(stage), "lineage"))

    def commit(self, stage: str, df: DataFrame,
               lineage: DataFrame | None = None,
               partition_by: list[str] | None = None) -> DataFrame:
        """Write + manifest-commit a stage; returns the re-read DataFrame
        (reading back pins the stage output — downstream plans scan parquet
        instead of recomputing the whole upstream lineage)."""
        d = self._dir(stage)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        spark = df.sparkSession
        catalog = _iceberg_catalog(spark)
        if catalog is not None:
            table = self._table(catalog, stage)
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS "
                      f"{catalog}.{self.namespace}")
            w = df.writeTo(table)
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()          # Iceberg metadata swap = commit
            out = spark.table(table)
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(os.path.join(d, "data"))
            out = spark.read.parquet(os.path.join(d, "data"))
        n_lineage = 0
        if lineage is not None:
            lineage.write.mode("overwrite").parquet(os.path.join(d, "lineage"))
            n_lineage = lineage.count()
        man = {
            "stage": stage,
            "rows": out.count(),
            "lineage_rows": n_lineage,
            "schema": out.schema.json(),
            "committed_at_epoch": int(time.time()),
            "backend": "iceberg" if catalog is not None
            else "parquet+manifest",
        }
        if catalog is not None:
            man["table"] = self._table(catalog, stage)
        tmp = self._manifest(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest(stage))  # atomic commit point
        return out

    def stage(self, spark: SparkSession, name: str, build,
              lineage_of=None, partition_by: list[str] | None = None) -> DataFrame:
        """Resume-or-build: committed stages load from parquet; otherwise
        `build()` runs and the result is committed (with optional lineage
        derived by `lineage_of(df)`)."""
        if self.committed(name):
            return self.read(spark, name)
        df = build()
        lineage = lineage_of(df) if lineage_of is not None else None
        return self.commit(name, df, lineage=lineage,
                           partition_by=partition_by)


def url_bucket(col: str = "url", buckets: int = 64):
    """Stable url-range bucketing for lineage keys (and partition pruning)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(buckets)).cast("int")


def lineage_by_url(df: DataFrame, stage: str, buckets: int = 64,
                   extra_aggs: dict | None = None) -> DataFrame:
    """Per-url-bucket lineage rows: (stage, bucket, out_count [, extras])."""
    aggs = [F.count(F.lit(1)).alias("out_count")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return (
        df.withColumn("bucket", url_bucket())
        .groupBy("bucket")
        .agg(*aggs)
        .withColumn("stage", F.lit(stage))
    )
