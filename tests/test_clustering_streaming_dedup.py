"""Connected-components near-dup clustering vs a Python union-find model,
and streaming dedup vs its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.dedup import (
    dedup_by_clusters,
    near_dup_clusters,
    ngram_jaccard_pairs,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find_on_synthetic_graph(spark):
    # chain 1-2-3, triangle 10-11-12, pair (20,21), singleton 30 via ids
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.createDataFrame([(30,)], "id long")
    got = {
        r.id: r.cluster_id for r in near_dup_clusters(pairs, ids=ids).collect()
    }
    want = _union_find(edges)
    want[30] = 30
    assert got == want
    assert got[3] == 1 and got[12] == 10 and got[30] == 30


def test_clusters_on_real_near_dup_pairs(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, df_cap=None)
    edge_list = [(r.id_a, r.id_b) for r in pairs.collect()]
    clusters = near_dup_clusters(pairs)
    got = {r.id: r.cluster_id for r in clusters.collect()}
    assert got == _union_find(edge_list)

    deduped = dedup_by_clusters(docs, clusters)
    n_clusters = len(set(_union_find(edge_list).values()))
    n_members = len(got)
    assert deduped.count() == docs.count() - (n_members - n_clusters)


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    from novi_pdq_etl_project_prod_spark.session import read_events
    from novi_pdq_etl_project_prod_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_dedup,
    )

    src = str(tmp_path / "src")
    ev = read_events(spark, SF_SMOKE).limit(200)
    # write the same events twice (simulated redelivery)
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 400

    stream = streaming_dedup(read_event_stream(spark, src), watermark="10 days")
    run_to_memory_sink(stream, "dedup_out", output_mode="append")
    out = spark.table("dedup_out")
    assert out.count() == 200
    assert out.select("event_id").distinct().count() == 200
