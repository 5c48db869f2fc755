"""Scale-discipline operators: bucketed co-located joins and skew
salting.

These are the techniques the 100 TB deployment leans on (SURVEY §7.2
P5): bucketing pre-shuffles fact tables once at write time so every
subsequent equi-join/aggregation on the bucket key runs exchange-free;
salting spreads a hot key over ``salt`` subkeys so no single task
owns it (AQE's skew-join split handles the join case automatically —
salting covers aggregations and pre-AQE plans).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def spread_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a scan whose split count is below the
    cluster's parallelism so the compute-heavy map work that follows
    (JSON encode/decode, shingle hashing, tokenization, vector math)
    runs on every core instead of serializing on the scan's few tasks.

    At production scale a 100-TB table arrives as thousands of files
    and this is a no-op (the guard never fires); it fires only when a
    source has fewer files than cores — single-file extracts,
    compacted single-row-group parquet, tiny demo topics — exactly the
    case where the repartition shuffle is small by construction. This
    guards the map stage's *parallelism*; AQE guards the reduce side.

    WHEN to spread (measured, sf0.1 / local[32], same-process A/B):
    only when heavy narrow compute follows the scan and the plan's
    first exchange is small or absent — brute-force similarity scoring
    (2.4×), per-doc bigram windows (7×), q1-style wide aggregates
    (1.3×). When the first real operator is a key shuffle (join,
    groupBy, per-id window), that shuffle already redistributes the
    rows, and pre-spreading just adds a full extra exchange: every
    TPC-H join query measured 1.2-3× FASTER without it. Callers are
    annotated with which case they are.

    Probe discipline: the guard reads ``df.inputFiles()`` (the plan's
    already-resolved file index — no job, no RDD) instead of
    ``df.rdd.getNumPartitions()``, which forced a plan→RDD conversion
    on every query build and throws on streaming DataFrames. File
    count under-estimates split count for multi-split giant files, so
    the guard can fire a redundant (cheap, parallelism-preserving)
    repartition there; non-file plans (local relations, streams) pass
    through untouched.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # streaming / non-file-resolvable plans
        return df
    if files and len(files) < target:
        return df.repartition(target)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table: joins and
    groupBys on ``bucket_cols`` between tables bucketed the same way
    need no exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def _default_salt(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt: a hash of EVERY column. Task retries
    recompute the identical salt for every row, so the salted shuffle
    stays a deterministic stage (the SPARK-23207 class of partial-stage
    -retry duplication/loss that position-derived salts —
    spark_partition_id + monotonically_increasing_id — are exposed to;
    same rule two_phase_topk's ``salt_col`` contract documents).

    Caveat: byte-identical rows share a salt, so a hot key whose rows
    are all IDENTICAL still lands in one bucket — pass an explicit
    ``salt_col`` over a unique row id for that shape.

    Column names are backtick-quoted (a literal dot in a name must not
    parse as struct-field access) and map-typed columns are skipped
    (xxhash64 rejects MapType — maps have no canonical entry order);
    a frame whose every column is a map needs an explicit salt_col."""
    cols = [
        F.col("`" + c.replace("`", "``") + "`")
        for c, t in df.dtypes
        if not t.startswith("map<")
    ]
    if not cols:
        raise ValueError(
            "salted_agg/salted_join: no hashable (non-map) columns to derive "
            "a deterministic salt from — pass salt_col explicitly"
        )
    return F.pmod(F.xxhash64(*cols), F.lit(salt))


def _require_salt_varies_within_key(df: DataFrame, key_cols: list[str], op: str) -> None:
    """Loud guard for the degenerate salting shape (ADVICE r7): the
    deterministic default salt hashes every column, so when the frame
    has NO hashable column outside the key, the salt is a pure
    function of the key — every row of a hot key lands in ONE bucket
    and the monster task the salting exists to break is back, silently.
    That shape is statically detectable from the schema, so refuse it
    (identical-duplicate rows beyond this case are data-dependent and
    stay a documented caveat: pass salt_col over a unique row id)."""
    keys = set(key_cols)
    hashable_outside = [
        c for c, t in df.dtypes if c not in keys and not t.startswith("map<")
    ]
    if not hashable_outside:
        raise ValueError(
            f"{op}: every hashable column is part of the key, so the "
            "deterministic default salt would be CONSTANT within each key "
            "and spread nothing — pass salt_col (e.g. a unique row id) "
            "explicitly"
        )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(key, salt) partial →
    groupBy(key) final. ``aggs``: out_col → (in_col, fn) with fn in
    {sum, count, min, max} (the re-aggregatable functions; partial
    counts re-aggregate with sum).

    A single hot key becomes ``salt`` partial rows instead of one
    monster task; cost is a second (tiny) shuffle over the partials.
    The salt is deterministic per row (see ``_default_salt``) so the
    shuffle survives task retries exactly-once; ``salt_col`` overrides
    it (mod ``salt`` is applied here) when rows are not unique.
    """
    if "_salt" in df.columns:
        raise ValueError(
            "salted_agg: input already has a '_salt' column — it would be "
            "silently overwritten; rename it first"
        )
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    if salt_col is None:
        _require_salt_varies_within_key(df, group_cols, "salted_agg")
    spread = F.pmod(salt_col, F.lit(salt)) if salt_col is not None else _default_salt(df, salt)
    salted = df.withColumn("_salt", spread)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[fns[fn](F.col(src)).alias(out) for out, (src, fn) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[refn[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
    salt_col: Column | None = None,
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a row-local salt in
    [0, salt), the small side is replicated ``salt`` times, and the
    join runs on ``on + [_salt]`` — a hot join key's rows spread over
    ``salt`` shuffle partitions instead of one monster task, at the
    cost of shuffling the small side ``salt``×.

    When to reach for it: the small side is too big to broadcast AND
    the key histogram is skewed AND you can't rely on AQE's runtime
    skew split (static plans, pre-shuffle bucketing, or a combiner-less
    downstream that needs the spread to persist). For a genuinely tiny
    dimension, ``broadcast()`` beats this — no shuffle at all.

    The salt is a deterministic hash of ALL the big side's columns
    (same recipe as ``salted_agg`` — retry-stable, see
    ``_default_salt``), so it varies WITHIN every join key as long as
    rows differ somewhere outside the key — salting by any function of
    the key alone would spread nothing. For byte-identical duplicate
    rows, pass ``salt_col`` over a unique row id.

    Inner/left joins only: a right/full outer join would emit every
    unmatched SMALL-side row once per replica (``salt`` copies) —
    flip the sides (the preserved side must be the salted one)."""
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: a "
            "right/full outer join would duplicate unmatched replicated "
            "small-side rows salt times — swap the sides instead"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError(
            "salted_join: an input already has a '_salt' column — it would "
            "be silently overwritten and dropped from the output; rename it "
            "first"
        )
    sb = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    if salt_col is None:
        _require_salt_varies_within_key(big, on, "salted_join")
    spread = F.pmod(salt_col, F.lit(salt)) if salt_col is not None else _default_salt(big, salt)
    bb = big.withColumn("_salt", spread.cast("int"))
    return bb.join(sb, [*on, "_salt"], how).drop("_salt")


def two_phase_topk(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    k: int,
    salt_col: Column,
    rank_alias: str = "rn",
    n_salt: int = 32,
) -> DataFrame:
    """Per-group top-k without a whole-group window sort: rank within
    (group, salt) slices first — ``n_salt``-way parallel — then rank
    only the surviving ``n_salt × k`` rows per group. The global
    per-group top-k is always contained in the union of per-slice
    top-ks, so the result is IDENTICAL to the single-window form
    provided ``order`` is a total order (use a unique tiebreaker).

    ``salt_col`` must be deterministic per row (hash of a row id, so
    replays land identically) — its VALUE is irrelevant to the result,
    it only spreads the slice work. Use when groups are few and huge
    (the per-pg-schema / per-source shape): a single per-group rank
    window serializes each group through one task.

    Output: the input columns plus ``rank_alias`` (1-based, ≤ k)."""
    from pyspark.sql.window import Window

    if "_salt" in df.columns:
        raise ValueError("two_phase_topk: input already has a '_salt' column")
    w_slice = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    w_final = Window.partitionBy(*group_cols).orderBy(*order)
    survivors = (
        df.withColumn("_salt", F.pmod(salt_col, F.lit(n_salt)))
        .withColumn("_rn", F.row_number().over(w_slice))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    return survivors.withColumn(rank_alias, F.row_number().over(w_final)).filter(
        F.col(rank_alias) <= k
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Hive-style partitioned layout: one directory per partition
    value. Queries filtering on ``partition_cols`` scan only the
    matching directories (partition pruning — at 100 TB this is the
    difference between reading one day and reading three years).
    ``sort_cols`` additionally sorts rows inside each file so parquet
    row-group min/max statistics prune within the partition."""
    out = df
    if sort_cols:
        out = out.repartition(*[F.col(c) for c in partition_cols]).sortWithinPartitions(
            *sort_cols
        )
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partition_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; filters on the partition columns
    placed by the caller become directory-level pruning (visible as
    ``PartitionFilters`` in the formatted plan)."""
    return spark.read.parquet(path)


def zorder_index(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative integer columns
    (``bits`` low bits each → one ``2·bits``-bit locality key).

    Writing a 100-TB table sorted by this key gives multi-dimensional
    data-skipping: a range predicate on EITHER column maps to a
    bounded set of z-ranges, so min/max footer stats prune files for
    both columns at once — the layout trick behind Delta/Iceberg
    OPTIMIZE ZORDER, as a pure codegen'd column expression (an
    aggregate over bit positions; no Python, no shuffle — the sort
    that consumes the key is the caller's range partition).
    """
    import pyspark.sql.functions as F

    # pure-arithmetic fold (shift amounts can't be Columns): the
    # accumulator carries (z-so-far, remaining x bits, remaining y
    # bits, current output multiplier = 4^i) and peels one bit of each
    # input per step
    xm = x.bitwiseAND((1 << bits) - 1).cast("long")
    ym = y.bitwiseAND((1 << bits) - 1).cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("z"),
        xm.alias("xr"),
        ym.alias("yr"),
        F.lit(1).cast("long").alias("mult"),
    )
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)),
        init,
        lambda acc, _: F.struct(
            (
                acc["z"]
                + (acc["xr"] % 2) * acc["mult"]
                + (acc["yr"] % 2) * acc["mult"] * 2
            ).alias("z"),
            F.floor(acc["xr"] / 2).cast("long").alias("xr"),
            F.floor(acc["yr"] / 2).cast("long").alias("yr"),
            (acc["mult"] * 4).alias("mult"),
        ),
        lambda acc: acc["z"],
    )
