"""SparkSession factory tuned for this engine.

Centralizes the configs every job needs:

- Arrow enabled (all extraction / bloom stages are pandas UDFs);
- AQE on (runtime coalescing + skew-join handling — SURVEY §4);
- shuffle partitions sized to cores (overridable; at cluster scale this
  would be set per-job from input stats).

On a real cluster the same builder is used by ``spark-submit
--py-files``; only ``master`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "cmoncrawl-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores=None -> local[*]; otherwise local[cores]. On a cluster this
    function is still the single place configs live — master comes from
    spark-submit and the local[] fallback is ignored.
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env_cores) if env_cores else 0
    master = f"local[{cores}]" if cores and cores > 0 else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = (
            cores if cores and cores > 0 else DEFAULT_SHUFFLE_PARTITIONS
        )

    # Optional GC override for single-JVM local mode (all executor
    # threads share one heap). Benchmarking on this sandbox showed
    # run-to-run noise larger than any GC effect, so no default is
    # imposed; set SPARK_GRAFT_GC="-XX:+UseParallelGC" etc. to pin one.
    gc_opts = os.environ.get("SPARK_GRAFT_GC", "")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if gc_opts:
        builder = builder.config("spark.driver.extraJavaOptions", gc_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Register the driver's parquet tables as temp views; returns dict of DFs."""
    all_names = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    dfs = {}
    for name in names or all_names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
