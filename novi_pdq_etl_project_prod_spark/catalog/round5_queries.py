"""Round-5 catalog additions.

- ``m36`` one full k-means Lloyd iteration (E-step + M-step) in exact
  integer micro-units — the oracled core of ``m35_kmeans_clusters``
  (VERDICT r04 item 3): the E-step equals ``m34_nearest_centroid``, the
  M-step is one more hash-agg over the SAME in-flight micro vectors, so
  only the iteration loop stays pytest-only.
- ``m37`` IVF-routed related-pair mining (VERDICT r04 item 7): the
  density-adaptive pair miner for the cos ≥ 0.5 regime where hash-bucket
  LSH recall collapses. No oracle (k-means routing isn't SQL); ground
  truth is the pinned recall floor vs exact numpy all-pairs
  (tests/test_round5_ops.py) and the 200k-density measurement in
  SCALE.md (recall 0.545, zero false positives).

Each query follows the determinism contract in catalog/__init__ (exact
integer/decimal aggregation, double only at the final edge, identical
literal constants in both engines) so the DuckDB oracle hash-matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from novi_pdq_etl_project_prod_spark.operators.similarity import (
    embedding_related_pairs_ivf,
    kmeans_em_step,
)
from novi_pdq_etl_project_prod_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # assert-and-adapt fixture read: absorbs driver testdata schema drift
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# M36 — one exact-integer Lloyd iteration: assign every vector to its
# nearest label centroid (E), then recompute per-(cluster, dim) integer
# centroid accumulators from those assignments (M). One broadcast + one
# (cluster, dim)-cardinality hash-agg; nothing row-shaped shuffles.
# ---------------------------------------------------------------------------

def m36_kmeans_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_em_step(emb)


M36_SQL = """
WITH vm AS (
  SELECT vec_id AS id, label AS true_label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v
  FROM embeddings
),
acc AS (
  SELECT true_label AS label, dim, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s
  FROM vm GROUP BY 1, 2
),
cent AS (
  -- integer mean in micro units, round-half-up via pure integer ops
  SELECT label, dim,
         CAST((2*s + n - ((((2*s + n) % (2*n)) + 2*n) % (2*n))) // (2*n)
              AS BIGINT) AS c
  FROM acc
),
d AS (
  SELECT vm.id, cent.label AS cand,
         CAST(SUM((vm.v - cent.c) * (vm.v - cent.c)) AS BIGINT) AS d2
  FROM vm JOIN cent ON vm.dim = cent.dim
  GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY d2, cand) AS rn FROM d
),
a AS (SELECT id, cand AS cluster FROM r WHERE rn = 1)
SELECT a.cluster, vm.dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(vm.v) AS BIGINT) AS sum_micro,
       CAST((2*SUM(vm.v) + COUNT(*)
             - ((((2*SUM(vm.v) + COUNT(*)) % (2*COUNT(*))) + 2*COUNT(*))
                % (2*COUNT(*))))
            // (2*COUNT(*)) AS BIGINT) AS c_micro
FROM vm JOIN a USING (id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# M37 — IVF-routed related-pair mining over embeddings. Approximate by
# design (trained-centroid routing), deterministic end to end (seeded
# hash-spread sample, stable argsorts, float64 BLAS scoring), precision
# 1.0 by construction; no SQL oracle — see module docstring.
# ---------------------------------------------------------------------------

def m37_ivf_related_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_related_pairs_ivf(emb, threshold=0.5)


QUERIES = {
    "m36_kmeans_em_step": m36_kmeans_em_step,
    "m37_ivf_related_pairs": m37_ivf_related_pairs,
}

ORACLES = {
    "m36_kmeans_em_step": M36_SQL,
}
