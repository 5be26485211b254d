"""Table I/O: Iceberg-when-available, Parquet otherwise, plus stage
checkpoint bookkeeping.

The target spec names Iceberg tables; this sandbox has no Iceberg jars, so the
writer selects ``format("iceberg")`` only when a catalog is configured on the
session and otherwise writes plain Parquet paths with ``_SUCCESS`` markers —
the resume contract is identical either way (a stage is complete iff its
output committed atomically).

Reference analog of the model/stage persistence: gob ``dump``/``load`` of the
hasher (/root/reference/lsh/hasher.go:221-251) — generalized to every pipeline
stage, keyed by the config hash so a config change never resumes stale data.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured on this session."""
    conf = spark.conf
    try:
        for key in ("spark.sql.catalog.spark_catalog", "spark.sql.catalog.local"):
            try:
                if "iceberg" in (conf.get(key) or "").lower():
                    return True
            except Exception:
                continue
    except Exception:
        pass
    return False


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Write a stage output.  ``Store.Clear()`` analog
    (/root/reference/store/store.go:17) = overwrite mode."""
    spark = df.sparkSession
    if iceberg_available(spark):  # pragma: no cover - no jars in sandbox
        writer = df.writeTo(path)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if iceberg_available(spark) and not path.startswith("/"):  # pragma: no cover
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def stage_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    seconds: float
    resumed: bool


def write_manifest(workdir: str, config_hash: str, stages: list[StageResult],
                   extra: dict | None = None) -> str:
    manifest = {
        "config_hash": config_hash,
        "written_at_unix": int(time.time()),
        "stages": [vars(s) for s in stages],
        **(extra or {}),
    }
    path = os.path.join(workdir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, path)
    return path
