"""SparkSession factory tuned for the engine.

Local-mode defaults match the test/bench container (local[N], single JVM);
the same config block is what we would ship to a 1000-executor cluster with
only the master/memory lines swapped — AQE, UTC timestamps, and Arrow are
scale-independent choices.

Multi-executor deployment contract (round-11 multi-JVM axis): this
package must be IMPORTABLE on the executors' Python workers —
cloudpickle serializes the module-level helpers inside the mapInPandas
operators (spatial ray-cast, codec kernels, USGS fetchers) by module
REFERENCE, not by value, so a worker that cannot import
``earthquake_data_pipeline_spark`` dies with ModuleNotFoundError on
first use. pip-install the package into the executor image, ship a zip
via ``--py-files``, or set ``spark.executorEnv.PYTHONPATH``;
tools/multijvm_check.py proves the full catalog across real process
boundaries on ``local-cluster[2,4]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "earthquake-data-pipeline-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    - UTC session timezone: required for DuckDB-oracle equivalence (DuckDB
      timestamps are UTC-naive).
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting —
      the knob that makes one config survive sf0.001 → 100 TB.
    - Arrow on: vectorized pandas_udf / toPandas transfer.
    - shuffle.partitions ~ cores locally; on a real cluster this is
      overridden per-job (AQE coalesces down from a high initial value).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Reliable checkpoints (qcommon.reuse with a checkpoint dir) are
        # only GC-cleaned by the ContextCleaner with this flag; without
        # it a long-lived driver leaks checkpoint-dir storage per pin
        # (ADVICE r10). Harmless when no checkpoint dir is set.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
