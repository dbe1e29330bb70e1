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
