"""SparkSession factory.

Defaults follow the engine's scale posture: AQE on (runtime coalescing +
skew-join handling), UTC session timezone (reference stores
``TIMESTAMP WITH TIME ZONE``; pinning UTC makes parquet/DuckDB/Spark
agree), Arrow enabled for the pandas-UDF paths.

On a real cluster, ``spark.sql.shuffle.partitions`` should be sized to
~2-3x total executor cores (AQE coalesces down); locally we default to
the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "usajobs_etl_service_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, pass ``None`` and submit via spark-submit with the cluster
    master so this factory only sets SQL-level conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet scans: keep partitions near executor-memory-friendly sizes
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet carries INT64 TIMESTAMP(NANOS): read as
        # long, converted back to micros in read_table (matches DuckDB's
        # nanos->micros truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one testdata parquet table, normalizing nano-precision
    timestamp columns (read as long via nanosAsLong) back to
    TimestampType at microsecond precision — the same truncation DuckDB
    applies when it reads TIMESTAMP_NS."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    try:  # session-settable; needed when the caller built its own session
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        for field in df.schema.fields:
            if field.name == "ts" and isinstance(field.dataType, T.LongType):
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a testdata parquet table from the file
    footer(s) — NO Spark job, no scan. Parquet stores num_rows in its
    footer metadata, so sizing hints (e.g. the SRP auto-width's
    ``n_rows_hint``, which otherwise costs a ``df.count()`` pass per
    query) are free where the input is a known parquet artifact. Falls
    back over directory layouts by summing per-file footers."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Read the star-schema parquet tables under ``sf_dir`` and register
    each as a temp view; returns ``{name: DataFrame}``."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
