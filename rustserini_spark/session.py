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


def fan_out(df, target: int | None = None):
    """Scale-adaptive scan fan-out: round-robin repartition a relation whose
    partition count is below the session's parallelism, so the map-side work
    that follows (tokenize/shingle explode, Arrow/BLAS kernels) uses every
    core instead of one task per input file.

    This is the single-row-group-parquet fix: the local fixtures are one
    ~6 MB file with ONE row group, so `maxPartitionBytes` cannot split the
    scan and every pre-shuffle pass otherwise runs serially (measured at
    sf1.0/50k docs: the simhash signature pass, the cosine matmul and every
    tokenize+explode ran 1-of-32 cores). At warehouse scale an input table
    is thousands of files/row groups, the scan already has >= parallelism
    partitions, and this is a no-op — the guard makes the behavior
    scale-adaptive rather than a local-mode constant.

    The repartition is keyless round-robin (deterministic under retry via
    Spark's sort-before-repartition) and moves only the few MB a low-partition
    relation can possibly hold — by definition the input is small, or it
    would already have enough partitions.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def filter_unpushed(df, cond):
    """Filter WITHOUT letting Catalyst push the predicate below the child
    projection.

    When a filter references columns computed by an expensive projection
    (tokenize + feature trees here), Catalyst's pushdown substitutes the FULL
    defining expression per reference below the project — the projection then
    runs once per referenced column plus once for the surviving rows (the
    optimization guide documents the same pathology for UDFs, §4.4; it holds
    for large pure-expression trees too, measured 5x on the curation feature
    pass at 50k docs). OR-ing the predicate with an always-false
    non-deterministic term (``monotonically_increasing_id() < 0`` — the id is
    non-negative by construction: partition id << 33 + row offset) makes the
    predicate non-deterministic, which pins it above the projection while
    changing nothing about which rows survive. Use ONLY when every referenced
    column is computed — a raw-column predicate would lose its parquet
    PushedFilters entry (derived-column predicates never had one)."""
    from pyspark.sql import functions as F

    return df.filter(cond | (F.monotonically_increasing_id() < F.lit(0)))


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
        # Local mode: the driver JVM IS the executor fleet, so its heap must
        # cover every concurrent task's join/agg state. 16g left one driver
        # bench rep dead on java.lang.OutOfMemoryError at sf1.0 (BENCH_r07
        # sample 2); the host has 128 GiB, so size the heap like the
        # executor memory a 32-core cluster node would get. Env-overridable
        # for smaller hosts; cluster deployments set executor memory instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
