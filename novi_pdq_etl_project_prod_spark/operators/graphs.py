"""Graph statistics over edge lists: triangle counting and clustering.

The pair graphs this engine produces — near-duplicate pairs
(``operators.dedup``), related-embedding pairs
(``operators.similarity``), co-occurrence pairs — need structural QA:
a dedup graph whose components are cliques (every pair re-confirmed)
behaves very differently under transitive closure than one held
together by single bridge edges. Triangle density / the global
clustering coefficient is the standard single-number probe for that.

Algorithm: degree orientation [Cohen 2009, "Graph Twiddling in a
MapReduce World"]. Orienting every edge from its lower-degree endpoint
to its higher-degree endpoint turns the O(Σ deg²) wedge join into
O(Σ out-deg²) where every out-degree is ≤ √(2·|E|) — the arboricity
bound that keeps hub vertices from exploding the join at scale. Each
triangle is then generated exactly once, at its lowest-degree vertex.

All shapes are joins/aggregates on the edge list itself — no adjacency
collection, no driver-side graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list normalized to ``u < v``, self-loops dropped,
    duplicates collapsed. Output columns: ``u``, ``v``."""
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    return (
        df.select(u.alias("u"), v.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_stats(df: DataFrame, src: str, dst: str) -> DataFrame:
    """One-row graph summary: ``n_vertices``, ``n_edges``, ``n_wedges``
    (open two-paths, Σ C(deg,2)), ``n_triangles``, and
    ``global_clustering`` = 3·T / W (0.0 for wedge-free graphs).

    Triangle enumeration uses degree orientation (module docstring):
    edges point low-degree → high-degree (vertex id breaks ties), the
    wedge join pairs out-neighbors per vertex, and a semi-join against
    the canonical edge set closes each wedge. Exactly-once counting
    needs no post-hoc division: every triangle has a unique
    minimum-(degree, id) vertex.

    Scale: two hash-aggs (degrees, final), one self-join bounded by
    arboricity, one closure join keyed on canonical edges. No
    collect(); the output is a single row. The canonical edge list
    feeds four branches (degrees, orientation, closure, edge count), so
    it is persisted through the cache-lifecycle seam — callers release
    it at their query boundary (``cache.release()``).
    """
    from novi_pdq_etl_project_prod_spark import cache

    edges = cache.track(canonical_edges(df, src, dst), eager=True)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient low → high by (deg, id); broadcast-join degrees onto edges.
    du = deg.select(F.col("x").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("deg").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    # Wedges at the orientation source: pairs of out-neighbors of `a`.
    o1 = oriented.select("a", F.col("b").alias("n1"))
    o2 = oriented.select("a", F.col("b").alias("n2"))
    wedges = o1.join(o2, "a").where(F.col("n1") < F.col("n2"))
    closed = wedges.join(
        edges.select(F.col("u").alias("n1"), F.col("v").alias("n2")),
        ["n1", "n2"],
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    out = summary.crossJoin(n_edges).crossJoin(tri)
    return out.select(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") > 0,
               F.lit(3.0) * F.col("n_triangles").cast("double")
               / F.col("n_wedges").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("global_clustering"),
    )


def pagerank_integer(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iterations: int = 10,
    damping_num: int = 17,
    damping_den: int = 20,
    unit: int = 1_000_000,
    on_round=None,
) -> DataFrame:
    """Deterministic integer-arithmetic PageRank over an undirected edge
    list — the domain/document-authority signal crawl pipelines rank
    hosts with (Common Crawl publishes exactly this as its harmonic/
    PageRank host ranking): ``r₀ = unit`` per node, then ``iterations``
    rounds of

        r_{t+1}(v) = (unit·(den−num)) div den
                     + Σ_{u∈N(v)} (r_t(u)·num) div (den·deg(u))

    with damping ``num/den`` (default 17/20 = 0.85). EVERY step is
    integer multiply / floor-divide / sum — no float mass anywhere — so
    a fixed iteration count is bit-reproducible across engines,
    partitionings, and retries, and a SQL oracle replays it as unrolled
    CTE rounds (floating-point PageRank cannot be oracled: the per-node
    float sum is addition-order-dependent). Quantization loss per node
    per round is < 1 micro-unit per neighbor — ranking-irrelevant at
    ``unit = 1e6``.

    Scale shape: the symmetrized edge list is persisted ONCE,
    pre-partitioned on ``src`` so every round's contribution join reuses
    that partitioning (the ``near_dup_clusters`` loop discipline);
    per-round state is one (node, rank) row per vertex —
    node-list-sized, never edge-sized; ``localCheckpoint`` truncates the
    growing lineage each round. Rounds are inherently sequential (each
    needs the previous ranks), so wall scales with iterations ×
    one-join cost, all shuffles key-partitioned.

    Output: (node, rank_micro) — exact integers; normalize downstream
    if a probability reading is needed.

    ``on_round(i, seconds)``, when given, is called after each round's
    localCheckpoint with the round's wall — the scale-probe hook for
    verifying the per-round cost tracks edge mass while checkpoint
    state stays node-bounded (no behavior change when None).
    """
    import time as _time

    from novi_pdq_etl_project_prod_spark import cache

    # Pin cached-plan output partitioning for the loop (optimization
    # r14): the session default lets AQE re-partition subtrees that
    # read cached relations (a broad win for one-shot cache readers —
    # see session.py), but THIS loop pre-partitions `sym` on the join
    # key precisely so every round's contribution join reuses the
    # cached layout; letting AQE coalesce it re-plans (and can
    # re-exchange) the edge side every round — A/B at sf0.1: ~9.2-13.6 s
    # with re-partitioning allowed vs ~8.5 s pinned. Restored in the
    # finally; the conf is session-global, so concurrent-query drivers
    # should run pagerank in its own session (same caveat as any
    # conf-scoped operator).
    spark = edges.sparkSession
    _conf_key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    try:
        _conf_prior = spark.conf.get(_conf_key)
    except Exception:
        _conf_prior = None
    spark.conf.set(_conf_key, "false")
    try:
        und = canonical_edges(edges, src, dst)
        sym0 = (
            und.select(F.col("u").alias("s"), F.col("v").alias("t"))
            .unionAll(und.select(F.col("v").alias("s"), F.col("u").alias("t")))
        )
        deg = sym0.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        # attach each source's degree to its edges ONCE: the per-round
        # loop then needs a single join + one agg instead of two joins +
        # a backfill join (the degree is round-invariant, and in the
        # symmetrized graph every node has ≥1 incoming edge, so the
        # contribution agg already covers the full node set — no
        # left-join backfill needed; measured ~40% of the fixed
        # per-round wall)
        sym = cache.track(
            sym0.join(deg, "s").repartition("s"), eager=True
        )
        base = (unit * (damping_den - damping_num)) // damping_den
        r = deg.select(
            F.col("s").alias("node"), F.lit(unit).cast("long").alias("r")
        ).localCheckpoint()
        for _i in range(iterations):
            _t0 = _time.perf_counter()
            r = (
                sym.join(r.withColumnRenamed("node", "s"), "s")
                .groupBy(F.col("t").alias("node"))
                .agg(
                    (
                        F.lit(base).cast("long")
                        + F.sum(
                            F.expr(
                                f"(r * {damping_num}L) div ({damping_den}L * deg)"
                            )
                        )
                    ).alias("r")
                )
            )
            # checkpoint EVERY round: A/B-measured 9.4 s (per-round) vs
            # 12.9 s (every 3rd) vs 16.4 s (every 8th) at sf0.1×10
            # rounds — Catalyst analysis/AQE cost grows superlinearly
            # with chained join depth, so cutting the plan each round
            # beats saving the per-job overhead, even though the chain
            # is single-consumer and would never recompute
            r = r.localCheckpoint()
            if on_round is not None:
                on_round(_i, _time.perf_counter() - _t0)
        sym.unpersist()
    finally:
        if _conf_prior is not None:
            spark.conf.set(_conf_key, _conf_prior)
        else:
            # conf.get raised (no value resolvable): leaving the pin in
            # place would permanently override the session default set in
            # session.py — unset restores default-resolution semantics
            # (ADVICE r14)
            try:
                spark.conf.unset(_conf_key)
            except Exception:
                pass
    return r.select("node", F.col("r").alias("rank_micro"))
