"""Checkpoint table layer: Iceberg when the runtime is present, else
Parquet + per-run JSON manifest.

The sandbox ships no Iceberg runtime jar, so the default is parquet with
Iceberg-snapshot-like semantics: each stage write is atomic-enough (write to
parquet, then record the stage in the manifest; a stage is only considered
committed if the manifest says so), resumable (skip-if-committed — the Spark
analog of the reference's skip-if-processed resume,
scripts/batch_process.py:357-360, and stage-file caching,
mcp/graph_tools.py:503-529).

When the Iceberg classes ARE on the classpath AND a `kg_ckpt` Spark catalog
is configured (spark.sql.catalog.kg_ckpt=org.apache.iceberg.spark.SparkCatalog
plus type/warehouse — the standard hadoop-catalog setup), checkpoint tables
are written with `writeTo(...).using("iceberg")` instead, gaining real
snapshot isolation and time travel; the JSON manifest is still written either
way, because resume decisions key off the manifest, not the storage format.
The writer/reader is isolated here so the backend choice is invisible to
every stage (SURVEY.md §7 risk note).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ICEBERG_CACHE: dict[str, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath AND the
    `kg_ckpt` catalog is configured. Probed once per JVM."""
    if "ok" not in _ICEBERG_CACHE:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog")
            has_jar = True
        except Exception:
            has_jar = False
        _ICEBERG_CACHE["ok"] = has_jar
    if not _ICEBERG_CACHE["ok"]:
        return False
    try:
        return spark.conf.get("spark.sql.catalog.kg_ckpt", None) is not None
    except Exception:
        return False


def _ckpt_table_ident(run_dir: str, stage: str, table: str) -> str:
    import re
    run_id = re.sub(r"[^A-Za-z0-9_]", "_", Path(run_dir).name)
    return f"kg_ckpt.{run_id}.{stage}_{table}"


def _manifest_path(run_dir: str) -> Path:
    return Path(run_dir) / MANIFEST


def read_manifest(run_dir: str) -> dict:
    p = _manifest_path(run_dir)
    if p.exists():
        return json.loads(p.read_text())
    return {"run_id": Path(run_dir).name, "stages": {}}


def _write_manifest(run_dir: str, manifest: dict) -> None:
    p = _manifest_path(run_dir)
    tmp = p.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(manifest, indent=2))
    tmp.replace(p)  # atomic on POSIX


def stage_committed(run_dir: str, stage: str, table: str) -> bool:
    m = read_manifest(run_dir)
    return table in m["stages"].get(stage, {}).get("tables", {})


def checkpoint_write(
    df: DataFrame,
    run_dir: str,
    stage: str,
    table: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Write a stage output table, record it in the manifest with row count
    and wall time, append per-partition metrics rows, and return the
    re-read DataFrame (truncated lineage — downstream stages read parquet,
    never recompute upstream plans)."""
    spark = df.sparkSession
    path = f"{run_dir}/{stage}/{table}"
    t0 = time.time()
    use_iceberg = iceberg_available(spark)
    if use_iceberg:
        ident = _ckpt_table_ident(run_dir, stage, table)
        w = df.writeTo(ident).using("iceberg")
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
    else:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
    wall_ms = int((time.time() - t0) * 1000)

    out = (spark.read.table(_ckpt_table_ident(run_dir, stage, table))
           if use_iceberg else spark.read.parquet(path))
    # Per-partition lineage/metrics rows (north rule; reference analog:
    # core/monitoring.py PhaseMetrics) — one extra cheap scan of the
    # just-written parquet.
    run_id = Path(run_dir).name
    metrics = (
        out.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows_out"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.lit(table).alias("table"),
            F.col("partition_id").cast("int"),
            F.col("rows_out").cast("long"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.current_timestamp().alias("ts"),
        )
    )
    metrics.write.mode("append").parquet(f"{run_dir}/metrics")

    manifest = read_manifest(run_dir)
    st = manifest["stages"].setdefault(stage, {"tables": {}})
    st["tables"][table] = {
        "path": (_ckpt_table_ident(run_dir, stage, table)
                 if use_iceberg else path),
        "format": "iceberg" if use_iceberg else "parquet",
        "rows": out.count(),
        "wall_ms": wall_ms,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    _write_manifest(run_dir, manifest)
    return out


def checkpoint_read(spark: SparkSession, run_dir: str, stage: str, table: str) -> DataFrame:
    # the manifest records which backend WROTE the table — honor it, so a
    # resume still works when the Iceberg runtime's availability changed
    # between the write and the restart (e.g. parquet checkpoints resumed
    # from a session that now has the kg_ckpt catalog, or vice versa)
    m = read_manifest(run_dir)
    fmt = m["stages"].get(stage, {}).get("tables", {}).get(table, {}) \
        .get("format")
    if fmt is None:
        fmt = "iceberg" if iceberg_available(spark) else "parquet"
    if fmt == "iceberg":
        return spark.read.table(_ckpt_table_ident(run_dir, stage, table))
    return spark.read.parquet(f"{run_dir}/{stage}/{table}")


def read_metrics(spark: SparkSession, run_dir: str) -> DataFrame:
    return spark.read.parquet(f"{run_dir}/metrics")


def checkpoint_gc(base_dir: str, keep_last: int = 3) -> list[str]:
    """Retention cleanup for checkpoint runs: under `base_dir`, keep the
    `keep_last` most recently committed run directories (ordered by the
    max committed_at across their manifest tables; ISO-8601 strings sort
    chronologically) and delete the rest. Only directories carrying a
    manifest are candidates — anything else under base_dir is not ours and
    is never touched. Returns the deleted run paths."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    base = Path(base_dir)
    if not base.is_dir():
        return []
    runs: list[tuple[str, Path]] = []
    for child in sorted(base.iterdir()):
        if not child.is_dir() or not (child / MANIFEST).exists():
            continue
        m = json.loads((child / MANIFEST).read_text())
        stamps = [t.get("committed_at", "")
                  for st in m.get("stages", {}).values()
                  for t in st.get("tables", {}).values()]
        runs.append((max(stamps) if stamps else "", child))
    runs.sort(key=lambda t: (t[0], t[1].name), reverse=True)
    deleted = []
    for _, path in runs[keep_last:]:
        shutil.rmtree(path)
        deleted.append(str(path))
    return deleted
