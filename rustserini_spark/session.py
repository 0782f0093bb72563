"""SparkSession construction with scale-appropriate defaults.

Local mode stands in for a multi-executor cluster; every config here is the one
you would also set cluster-side (AQE, Arrow, shuffle partitions sized to cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def local_rows_df(spark: SparkSession, rows, schema):
    """Small driver-side row list -> DataFrame via the pandas/Arrow path.

    pyspark 4.1's plain ``createDataFrame(list)`` costs ~4.5s of FIXED driver
    work per materialization regardless of row count (measured: 40 rows at
    local[32] — a python-runner conversion stage that never gets cheap),
    while the pandas route is ~0.1s. Every interactive/per-batch local
    relation (query-term frames, ANN probe sets, empty results) must come
    through here — at batch rates that fixed cost IS the scaling floor.

    ``schema`` is either a DDL string ("a string, b long") or a StructType.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        # real DDL parse, not schema.split(',') — comma-bearing types
        # (decimal(10,2), map<string,int>, struct<...>) would break a split
        names = StructType.fromDDL(schema).fieldNames()
    else:  # StructType
        names = list(schema.fieldNames())
    pdf = pd.DataFrame(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=schema)


def get_spark(
    app_name: str = "rustserini_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # local[N] → N concurrent tasks; shuffle partitions sized to parallelism,
    # not the 200 default (tiny-partition overhead dominates at test scale,
    # and on a real cluster you would size this to 2-3x total cores or rely on AQE).
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
