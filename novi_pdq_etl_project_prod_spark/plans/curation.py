"""Corpus-curation pipeline: the north-star training-data operators
composed into the standard pre-training data flow —

    quality gate → exact dedup → domain-mixture sample → train/test split

Each stage is one of the already-oracled primitives (text quality
features, md5 fingerprint dedup, md5-threshold mixture sampling, a
content-addressed split), so the COMPOSITION is itself deterministic and
fully SQL-expressible — the catalog query ``m21_curation_pipeline``
hash-matches a DuckDB oracle end-to-end.

Scale shape: stages 1, 3 and 4 are row-local filters/projections (no
shuffle); the only shuffle is the dedup's fingerprint window. The whole
pipeline is therefore ONE exchange over the corpus regardless of how
many curation rules stack before or after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators import text as TX
from novi_pdq_etl_project_prod_spark.operators.multimodal import mixture_sample


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    rates: dict | None = None,
    default_rate: float = 1.0,
    test_fraction: float = 0.1,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Returns (id, source, n_tokens, split) for the surviving corpus.

    - **Quality**: token-count window [min_tokens, max_tokens] (the m5
      thresholds reduced to the scale-relevant one; callers stack more
      predicates before dedup so junk never pays for a shuffle).
    - **Dedup**: normalized-text md5 fingerprint, min-id survivor (the
      deterministic exact-dedup contract from ``operators.dedup``).
    - **Mixture**: per-source md5-threshold Bernoulli
      (``mixture_sample`` — content-addressed).
    - **Split**: md5-prefix threshold on (seed, id) — the same
      content-addressed idea as ``train_test_split`` but engine-portable
      (md5 instead of xxhash64), so the whole pipeline oracles exactly.
    """
    q = docs.where(TX.token_count(text_col).between(min_tokens, max_tokens))
    fp = TX.document_fingerprint(text_col)
    w = Window.partitionBy(fp).orderBy(F.col(id_col).asc())
    deduped = (
        q.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    sampled = mixture_sample(
        deduped, rates or {}, source_col=source_col, id_col=id_col,
        default_rate=default_rate,
    )
    u = F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
        1,
        4,
    )
    thr = format(min(max(int(round(test_fraction * 65536)), 0), 65535), "04x")
    return sampled.select(
        F.col(id_col),
        F.col(source_col),
        TX.token_count(text_col).alias("n_tokens"),
        F.when(u < F.lit(thr), F.lit("test")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )
