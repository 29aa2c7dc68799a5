"""SparkSession construction with scale-oriented defaults.

Tuned for the sandbox (local[N], single JVM) but every knob is the one
that matters on a 1000-executor cluster: AQE on (runtime re-plan +
skew-join splitting), Arrow enabled for every pandas UDF batch,
shuffle partitions sized to cores, broadcast threshold generous enough
for region dim tables.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip(out_path: str | None = None) -> str:
    """Zip the s2geometry_spark package for spark-submit --py-files /
    SparkContext.addPyFile so executors can import the kernels."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    if out_path is None:
        # unique per call: a fixed path under /tmp races with any other
        # session building the zip at the same moment (executors can
        # fetch a half-written archive) and collides across users; the
        # stable basename is what executors see via addPyFile.
        out_path = os.path.join(
            tempfile.mkdtemp(prefix="s2geometry_spark_pyfiles_"),
            "s2geometry_spark.zip",
        )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def build_session(
    app_name: str = "s2geometry_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores * 2, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # NOTE: do not force small-file scans wide here (openCostInBytes
        # / minPartitionNum): measured A/B at sf0.1 shows globally
        # over-splitting the few-MB local parquet costs more in per-task
        # overhead than it buys (tile assign 3.6s -> 5.2s, kNN 12.5s ->
        # 16.2s with minPartitionNum=cores).  The one stage that needs
        # width on a tiny scan — the minhash signature pUDF — gets an
        # explicit repartition at the operator (textops), which is also
        # the correct cluster-side idiom.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Ship the package to python workers (local mode spawns fresh worker
    # processes that do not inherit the driver's sys.path edits; on a
    # real cluster this is the --py-files artifact).
    spark.sparkContext.addPyFile(package_zip())
    return spark
