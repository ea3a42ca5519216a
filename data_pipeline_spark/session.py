"""SparkSession factory with scale-appropriate defaults.

Local mode is the test harness; the configs are chosen so the same code path
is correct on a 1000-executor cluster: AQE on (runtime re-plan + skew-join
split), shuffle partitions sized to parallelism, UTC session timezone (the
reference's canonical-timestamp lesson, scripts/s3_item_cleanup.py:38-42),
Arrow enabled for the vectorized UDF path.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession

_PKG_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``data_pipeline_spark`` importable in PYTHON WORKERS regardless
    of the driver's cwd/sys.path (driver-side path patches do not reach
    worker processes; cloudpickle serializes module functions by
    reference, so workers must import the package to run our pandas
    UDFs). Ships a zip via ``addPyFile`` once per SparkContext — the same
    mechanism as ``spark-submit --py-files``."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _PKG_SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # Cache key = digest over every .py file's (path, mtime, size) — a
    # directory mtime alone misses in-place edits inside subpackages, which
    # would ship workers a stale copy of the UDF code.
    sources: list[tuple[str, str]] = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "data_pipeline_spark", os.path.relpath(full, pkg_dir)
                )
                sources.append((full, rel))
    st = hashlib.sha256()
    for full, rel in sorted(sources, key=lambda fr: fr[1]):
        s = os.stat(full)
        st.update(f"{rel}:{s.st_mtime_ns}:{s.st_size};".encode())
    zip_path = os.path.join(
        "/tmp", f"data_pipeline_spark_{st.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + f".tmp.{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full, rel in sources:
                zf.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _PKG_SHIPPED.add(key)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "data_pipeline_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to ``2 * parallelism`` — enough slices to
    keep every core busy through AQE coalescing without tiny-partition
    overhead at test scale. On a real cluster this is set to
    ``2-3 × total executor cores`` and AQE coalesces down.
    """
    par = parallelism or default_parallelism()
    shuffle = shuffle_partitions or max(par, 2 * par)
    builder = (
        SparkSession.builder.master(f"local[{par}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# -- hermetic execution ------------------------------------------------------
#
# Temp views are SESSION-scoped, and their names are the engine's only
# shared mutable namespace: two operations that each register a view named
# ``pages`` for different physical tables can read each other's relation
# under interleaving (threaded callers, or a harness that runs many engine
# entries on one session). The reference isolates per-collection
# namespaces for the same reason (run_ingest_register.py:38-48). The fix
# is structural, not naming-convention: every statement that must resolve
# fixed names runs on a CHILD session (``spark.newSession()`` — own temp
# view catalog, shared SparkContext, shared cached data), so its view
# bindings are invisible to — and cannot be shadowed by — any other
# operation. Cost: one lightweight SessionState per invocation, no extra
# JVM, no extra executors.

# Runtime-set confs do not cross ``newSession()`` (it initializes from the
# SparkContext conf, i.e. builder-time settings only) — carry the ones
# that change query SEMANTICS or the plans we assert on.
_CARRY_CONF = (
    "spark.sql.session.timeZone",
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.ansi.enabled",
)


def hermetic_session(spark: SparkSession) -> "SparkSession":
    """A child session with an EMPTY, private temp-view namespace.

    Shares the SparkContext (executors, cached RDD/DF data, shipped
    py-files) but not the view catalog or runtime conf; the confs in
    ``_CARRY_CONF`` are copied so the child plans and computes exactly
    like its parent."""
    child = spark.newSession()
    for k in _CARRY_CONF:
        try:
            v = spark.conf.get(k)
        except Exception:
            continue
        if v is not None:
            child.conf.set(k, v)
    return child


def bridge_views(child: SparkSession, views: dict) -> None:
    """Make parent-session DataFrames resolvable BY NAME on ``child``.

    ``createOrReplaceTempView`` registers in the DataFrame's OWN session,
    so a caller-supplied DataFrame cannot be placed in a child session's
    catalog directly. Bridge: publish it under a collision-free unique
    GLOBAL temp view (visible to every session of the context), re-read
    it AS A DATAFRAME on the child (analysis inlines the global view's
    plan — SQL ``CREATE VIEW`` would instead store text and re-resolve
    on every reference), register that child DataFrame under the wanted
    local name, then drop the global immediately. The global name's
    lifetime is this function call, leaving zero shared-namespace
    residue."""
    import uuid as _uuid

    for name, df in (views or {}).items():
        g = f"bridge_{_uuid.uuid4().hex}"
        df.createOrReplaceGlobalTempView(g)
        try:
            child.table(f"global_temp.{g}").createOrReplaceTempView(name)
        finally:
            df.sparkSession.catalog.dropGlobalTempView(g)
