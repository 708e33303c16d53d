"""SparkSession factory with engine defaults.

Defaults are tuned for correctness-parity with a UTC-naive oracle
(session timezone pinned to UTC) and for scale (AQE on, Arrow on,
shuffle partitions sized to the machine rather than the 200 default).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

# Every frame materialize() persists, in persist order. Library
# operators return LAZY frames, so they cannot unpersist their own
# intermediates (the consuming action hasn't run yet); the lifecycle
# belongs to whoever runs the action — CLI, bench harness, tests —
# via release_materialized() / materialized_scope(). Unpersisting is
# always safe for correctness: a consumer that reads the frame later
# just recomputes from lineage.
_MATERIALIZED: list[DataFrame] = []


def materialize(df: DataFrame, memory: bool = True) -> DataFrame:
    """Reliable multi-consumer materialization / pushdown barrier.

    Used where a (typically small) intermediate feeds BOTH sides of a
    self-join or must not have filters substituted below it. persist()
    is lazy (no eager physical planning, unlike localCheckpoint) and —
    unlike localCheckpoint's executor-local blocks — is recomputable
    from lineage after an executor loss, so a 1000-executor run does
    not die with the first node. MEMORY_AND_DISK spills instead of
    OOMing when the intermediate outgrows executor memory; pass
    memory=False for DISK_ONLY when it is known to be large.

    The persisted frame is registered; call release_materialized()
    (or wrap the consuming action in materialized_scope()) after the
    terminal action, or a long-lived session accumulates cached frames
    until the executor block store churns under LRU eviction.
    """
    level = StorageLevel.MEMORY_AND_DISK if memory else StorageLevel.DISK_ONLY
    df = df.persist(level)
    _MATERIALIZED.append(df)
    return df


# Module switch for settle(): True -> persist()-based stage boundaries
# (lineage kept, recomputable after executor loss — for multi-executor
# cluster deployments that prefer recoverability over the driver-side
# planning cut). Default False = eager localCheckpoint (the measured
# 340x per-action planning win on deep funnels; see settle()).
SETTLE_LINEAGE = False


def settle(df: DataFrame, lineage: bool | None = None) -> DataFrame:
    """Stage-boundary materialization + LINEAGE CUT for deep pipelines.

    materialize()/persist() caches rows but KEEPS the nested logical
    plan, so in a multi-stage funnel every downstream action
    re-canonicalizes a plan tree that grows multiplicatively with
    stage depth — a driver-side, single-threaded cost no executor
    count fixes (measured: 16.05 s per action on a fully-cached
    6-stage funnel, 0.27 s after the cut; see SCALING.md round-11
    note). settle() is an EAGER localCheckpoint: it runs the stage
    now and replaces the plan with a LogicalRDD scan of the result.

    Trade-off vs materialize(): checkpointed blocks are executor-local
    and NOT recomputable from lineage after an executor loss. That is
    the right trade at a stage boundary of a corpus-wide funnel — the
    100 TB deployment writes survivors to durable storage between
    stages anyway (rerunning six fused corpus joins on any failure
    loses more than re-running one stage), and locally the eager
    checkpoint IS that between-stage materialization. Keep
    materialize() for within-operator self-join barriers where the
    intermediate is consumed inside one plan.

    The frame is registered for release_materialized(), whose
    _unpersist_any already frees checkpointed RDDs via the LogicalRDD
    path.

    `lineage` (default: module-level SETTLE_LINEAGE) opts a call — or,
    via the module switch, a whole deployment — back into persist()'d
    boundaries: rows cached but the logical plan kept, so an executor
    loss recomputes from lineage instead of failing the job. The cost
    is the multiplicative per-action driver planning this function
    exists to cut; prefer it only where executor churn is expected and
    funnels are shallow.
    """
    use_lineage = SETTLE_LINEAGE if lineage is None else lineage
    if use_lineage:
        return materialize(df)  # lazy persist: lineage-recoverable
    df = df.localCheckpoint(eager=True)
    _MATERIALIZED.append(df)
    return df


def swap_materialized(old: DataFrame, new: DataFrame) -> None:
    """Replace `old` with `new` in the registry — for iterative
    operators that persist a frame per round and eagerly unpersist the
    previous one (only the live frame should stay registered)."""
    try:
        _MATERIALIZED.remove(old)
    except ValueError:
        pass
    _MATERIALIZED.append(new)


def drop_materialized(df: DataFrame) -> None:
    """Unpersist `df` and deregister it — for iterative operators
    replacing a per-round persisted state whose NEW frame was already
    registered by its own materialize() call (swap_materialized would
    double-register it). Keeps the registry holding live frames only."""
    try:
        _MATERIALIZED.remove(df)
    except ValueError:
        pass
    _unpersist_any(df)


def _unpersist_any(df: DataFrame) -> None:
    """Unpersist a frame whether it was persist()ed or
    localCheckpoint()ed: Dataset.unpersist() only clears cache-manager
    entries; a checkpointed frame's RDD is persisted directly, so reach
    into its LogicalRDD plan too (guarded — falls back to GC cleanup on
    any plan-shape change)."""
    df.unpersist()
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def release_materialized() -> int:
    """Unpersist every registered frame (newest first); returns the
    count released. Safe to call repeatedly / with a stopped session."""
    n = 0
    while _MATERIALIZED:
        df = _MATERIALIZED.pop()
        try:
            _unpersist_any(df)
            n += 1
        except Exception:
            pass
    return n


@contextmanager
def materialized_scope():
    """Unpersist, on exit, exactly the frames materialize()d inside the
    scope — the pattern for running one pipeline inside a long-lived
    session without leaking cache:

        with materialized_scope():
            scored, errors = build_pipeline(spark, paths)
            scored.write.parquet(out)          # consuming action

    SINGLE-THREADED TOP-LEVEL CONTRACT: the scope is a len()-mark
    slice of the shared module-global registry, so two scopes open
    concurrently on different driver threads can unpersist each
    other's frames. Operators that fan work out to driver threads
    internally (dataset_diff's funnel pool) are fine — they join
    their threads before returning, so the registry is single-
    threaded again at every scope boundary — but do not open
    materialized_scope() itself on concurrent threads."""
    mark = len(_MATERIALIZED)
    try:
        yield
    finally:
        tail, del_from = _MATERIALIZED[mark:], mark
        del _MATERIALIZED[del_from:]
        for df in reversed(tail):
            try:
                _unpersist_any(df)
            except Exception:
                pass


def get_spark(
    app_name: str = "webloghunter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("WLH_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written event tables) is
        # unreadable as a timestamp; read as long and convert explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
