"""Sequence packing — batch documents into fixed token-budget bins for
LLM training (the step between curation and the data loader).

The classic formulation (first-fit-decreasing bin packing) is inherently
sequential; at 100 TB the scalable variant is *contiguous fill within
hash buckets*: documents are hashed into independent buckets, ordered
deterministically inside each bucket, and cut into packs wherever the
running token total crosses the budget. Each bucket packs in isolation,
so the operation is one shuffle (the per-bucket window sort) regardless
of corpus size, and adding buckets adds parallelism without changing any
existing pack assignment order semantics.

Determinism: the bucket key is a hex prefix of md5(id) — identical in
Spark and DuckDB — and the fill order is the document id, so the full
assignment is reproducible across engines and partition layouts (this is
the same content-addressed trick as mixture_sample / train_test_split in
operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: Column | str,
    budget: int,
    bucket_hex_chars: int = 1,
) -> DataFrame:
    """Assign each row a ``pack_id`` such that consecutive rows of a pack
    total ≤ ``budget`` tokens (rows larger than the budget occupy their
    own pack and overflow it — flagged via ``oversize``).

    ``bucket_hex_chars`` controls parallelism: 1 → 16 independent
    buckets (fine for tests), 2 → 256, 3 → 4096 (cluster scale). The
    shuffle moves only (id, token_count) pairs, not document payloads;
    join the assignment back to the corpus on ``id_col``.
    """
    tok = (F.col(token_count) if isinstance(token_count, str) else token_count).cast(
        "long"
    )
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, bucket_hex_chars)
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    # Contiguous fill: a row starts in the pack its *preceding* total
    # fell in. Integer div keeps both engines exact.
    seq = F.expr(f"(cum_tokens - n_tokens) div {int(budget)}")
    return (
        df.select(
            F.col(id_col),
            tok.alias("n_tokens"),
            bucket.alias("bucket"),
        )
        .withColumn("cum_tokens", cum)
        .select(
            id_col,
            "n_tokens",
            "bucket",
            F.concat_ws("-", F.col("bucket"), seq.cast("string")).alias("pack_id"),
            (F.col("n_tokens") > F.lit(int(budget))).alias("oversize"),
        )
    )


def concat_packed_sequences(
    docs: DataFrame,
    assignments: DataFrame,
    id_col: str,
    text_col: str,
    separator: str = " <eos> ",
) -> DataFrame:
    """Materialize training sequences: join the pack assignment back to
    the corpus and concatenate each pack's documents (ordered by id,
    ``separator``-joined) into one row per pack.

    Determinism: ``collect_list`` order is partition-dependent, so the
    list collects (id, text) structs and ``array_sort`` restores the id
    order before concatenation — same output on any layout. Group
    payload is bounded by the pack token budget, so the per-group state
    stays small no matter how large the corpus is. One shuffle (the
    pack_id aggregation) beyond the assignment join."""
    joined = docs.select(F.col(id_col), F.col(text_col)).join(
        assignments.select(id_col, "pack_id", "n_tokens"), id_col
    )
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t")))
    )
    return joined.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.concat_ws(
            separator, F.transform(pairs, lambda s: s["t"])
        ).alias("sequence"),
    )


def pack_fill_stats(assignments: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill summary over ``pack_sequences`` output: document
    count, token total, and fill ratio against the budget. One hash
    aggregation over the (already small) assignment table."""
    return assignments.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        (F.sum("n_tokens") / F.lit(int(budget))).alias("fill_ratio"),
    )
