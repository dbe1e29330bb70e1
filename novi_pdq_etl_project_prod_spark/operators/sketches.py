"""Mergeable distinct-count sketches (K-Minimum-Values).

The reference pipeline reports exact distinct counts per run
(``/root/reference/dags/pdq_etl_dag.py`` quality gates); at 100 TB an
exact global ``COUNT(DISTINCT)`` per dashboard refresh is a full
shuffle of every distinct value. A KMV sketch [Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"] keeps only the k
smallest hash values per group:

- **bounded state**: k rows per group, independent of cardinality;
- **mergeable**: the bottom-k of a union equals the bottom-k of the
  concatenated per-partition bottom-k's — so sketches built per shard /
  per day / per micro-batch combine without rescanning history (the
  same partial-aggregation contract Spark's own ``approx_count_distinct``
  HLL uses, but with an *exactly reproducible* register set);
- **deterministic**: the hash is the first 15 hex digits of
  ``md5(salt:value)`` read as a 60-bit integer — a pure function of the
  value, so Spark and the DuckDB oracle agree on every register
  bit-for-bit (same idiom as ``multimodal.pps_sample``).

Estimator: with h_(k) the k-th smallest of n uniform hashes on
[0, M), E[h_(k)] = k·M/(n+1), so ``n ≈ (k-1)·M / h_(k)`` (the
unbiased form). When a group holds fewer than k distinct values the
sketch IS the distinct set and the count is exact.

Scale shape: one hash-aggregate dedupes (group, value) with map-side
combine, then bottom-k runs in two stages — per (group, hash-bucket)
then per group — so no single task ever sorts a whole group's distinct
set. Output is k rows per group: thousands of rows total at any data
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Hash domain: 15 hex digits = 60 bits.
HASH_DOMAIN = 16**15

#: Pre-aggregation fan-out for the bottom-k (stage-1 partition count per
#: group). 64 buckets keeps stage-1 sorts at ~1/64 of a group's distinct
#: set while stage 2 sorts at most 64·k survivors.
_N_BUCKETS = 64


def kmv_hash(value: Column, salt: str = "kmv") -> Column:
    """60-bit deterministic uniform hash of ``value`` (stringified)."""
    hx = F.substring(F.md5(F.concat_ws(":", F.lit(salt), value.cast("string"))), 1, 15)
    return F.conv(hx, 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Bottom-``k`` hash registers per group: ``group_cols + [h]``.

    Two-stage bottom-k so the per-group sort never sees the full
    distinct set: stage 1 keeps k per (group, h mod 64) — each a
    ~1/64 slice — stage 2 keeps k of the ≤ 64·k survivors.

    NULL values are excluded before hashing — ``COUNT(DISTINCT)``
    semantics, matching the reference pipeline's quality gates (ADVICE
    r06: ``concat_ws`` silently drops NULL, which would otherwise fold
    every NULL into the one fixed ``md5('kmv')`` register and count NULL
    as a distinct value).
    """
    hashed = (
        df.select(*group_cols, F.col(value_col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
        .select(*group_cols, kmv_hash(F.col("__v"), salt).alias("h"))
    )
    bucket = F.pmod(F.col("h"), F.lit(_N_BUCKETS))
    w1 = Window.partitionBy(*group_cols, bucket).orderBy("h")
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= k)
        .drop("__r1", "__r2")
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 64,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Merge sketch rows (a union of per-shard ``kmv_sketch`` /
    ``sample_quantile_sketch`` outputs) back to one bottom-k per group.
    Exact: min-k(min-k(A) ∪ min-k(B)) = min-k(A ∪ B). Duplicate
    registers (the same value seen by two shards hashes identically)
    collapse via ``distinct`` first.

    ``carry_cols`` rides payload columns (the sample sketch's id/value)
    through the merge; they are part of the distinct key, which is safe
    because a register's payload is a pure function of the hashed id.
    """
    carry = list(carry_cols or [])
    # tie-break on the payload so duplicate-id registers (equal h,
    # different payload) merge deterministically — see
    # sample_quantile_sketch's dirty-key note
    w = Window.partitionBy(*group_cols).orderBy("h", *carry)
    return (
        sketches.select(*group_cols, "h", *carry)
        .distinct()
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate per group from sketch rows.

    Emits the register summary (``n_kept``, ``kth_hash``) alongside the
    estimate so downstream merges / audits keep the exact state, not
    just the rounded scalar. ``est_distinct`` is computed in double —
    both engines evaluate the identical correctly-rounded IEEE
    expression, so the oracle matches bit-for-bit.
    """
    scale = float((k - 1) * HASH_DOMAIN)  # exactly representable: (k-1)·2^60
    return sketch.groupBy(*group_cols).agg(
        F.count("h").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.when(F.count("h") < k, F.count("h").cast("double"))
        .otherwise(F.lit(scale) / F.max("h").cast("double"))
        .alias("est_distinct"),
    )


def kmv_set_overlap(
    df: DataFrame,
    value_col: str,
    set_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise distinct-set overlap estimates from KMV sketches — the
    theta-sketch intersection [Dasgupta et al. 2016, "Theta-Sketch
    Framework"]: ``|A ∩ B| ≈ c · M / θ`` where ``θ = min(θ_A, θ_B)``
    (each set's k-th smallest hash, or the full domain M when the set
    has fewer than k distinct values — then its sketch IS the set) and
    ``c`` counts registers below θ present in BOTH sketches.

    This answers "how many distinct values do A and B share?" from two
    k-row sketches — no shuffle of the raw sets, no distinct-join at
    data scale. Sketches may come from different tables, days, or
    clusters; only the register rows meet.

    Output per unordered set pair: ``set_a < set_b``, ``theta``,
    ``n_common`` and ``est_intersection`` (double — both engines
    evaluate the identical correctly-rounded IEEE expression).

    Scale shape: one :func:`kmv_sketch` pass over the data, then joins
    over k-row-per-set frames (broadcast by construction).
    """
    sk = kmv_sketch(df, value_col, [set_col], k=k, salt=salt)
    thetas = sk.groupBy(set_col).agg(
        F.when(F.count("h") < k, F.lit(HASH_DOMAIN))
        .otherwise(F.max("h"))
        .alias("theta")
    )
    ta = thetas.select(F.col(set_col).alias("set_a"), F.col("theta").alias("__ta"))
    tb = thetas.select(F.col(set_col).alias("set_b"), F.col("theta").alias("__tb"))
    base = ta.crossJoin(tb).where(F.col("set_a") < F.col("set_b"))
    # n_common must only count registers below the pair's theta, so the
    # join with the theta table happens before the count.
    common = (
        sk.select(F.col(set_col).alias("set_a"), "h")
        .join(F.broadcast(sk.select(F.col(set_col).alias("set_b"), "h")), "h")
        .where(F.col("set_a") < F.col("set_b"))
        .join(F.broadcast(ta), "set_a")
        .join(F.broadcast(tb), "set_b")
        .where(F.col("h") < F.least("__ta", "__tb"))
        .groupBy("set_a", "set_b")
        .agg(F.count("h").alias("n_common"))
    )
    theta = F.least("__ta", "__tb")
    return (
        base.join(F.broadcast(common), ["set_a", "set_b"], "left")
        .na.fill({"n_common": 0})
        .select(
            "set_a",
            "set_b",
            theta.alias("theta"),
            "n_common",
            (
                F.col("n_common").cast("double") * F.lit(float(HASH_DOMAIN))
                / theta.cast("double")
            ).alias("est_intersection"),
        )
    )


def sample_quantile_sketch(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: list[str],
    k: int = 512,
    salt: str = "sqs",
) -> DataFrame:
    """Deterministic bounded-state quantile summary per group: the rows
    whose ``id_col`` has the k smallest :func:`kmv_hash` values — a
    uniform random sample WITHOUT replacement whose membership is a
    pure function of the ids, so it is reproducible across engines,
    re-runs, and partitionings (unlike ``TABLESAMPLE``/t-digest) and
    auditable row by row.

    Mergeable by the same bottom-k law as the KMV sketch: the bottom-k
    of per-shard bottom-k's IS the bottom-k of the union, so per-day
    samples roll up into exactly the sample a full rescan would draw.
    Quantiles computed off the sample converge at the usual
    O(1/sqrt(k)) sampling rate; state is k rows per group, forever.

    Output: ``group_cols + [h, id_col, value_col]`` (register order by
    ``h``). Feed to an exact ``percentile`` aggregate for estimates
    (catalog query d23 pattern).

    Ids need not be globally unique — real fact tables have dirty keys
    (the driver's synthetic lineitem carries ~20% duplicated
    (orderkey, linenumber) pairs with different prices) — so the
    bottom-k ordering tie-breaks equal hashes on ``value_col``:
    without it, which duplicate crosses the k boundary is
    partition-order luck and the sample median flickers run to run
    (and against the oracle).

    The sample is over DISTINCT ``(group, id, value)`` rows: the direct
    path applies the same dedup :func:`kmv_merge` applies via its
    ``distinct`` over registers, so a merged roll-up of per-shard
    sketches equals the direct sketch of the union register-for-register
    (ADVICE r06: without this, exact-duplicate rows survived the direct
    path but collapsed in the merge, breaking the documented merge law).
    NULL ids are excluded — they would all fold into one fixed register.
    """
    hashed = df.select(
        *group_cols,
        kmv_hash(F.col(id_col), salt).alias("h"),
        F.col(id_col),
        F.col(value_col),
    ).where(F.col(id_col).isNotNull()).distinct()
    bucket = F.pmod(F.col("h"), F.lit(_N_BUCKETS))
    w1 = Window.partitionBy(*group_cols, bucket).orderBy("h", value_col)
    w2 = Window.partitionBy(*group_cols).orderBy("h", value_col)
    return (
        hashed.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= k)
        .drop("__r1", "__r2")
    )
