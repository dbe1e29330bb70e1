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

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
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
    token_counter: Callable[[str], Column] = TX.token_count,
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
    q = docs.where(token_counter(text_col).between(min_tokens, max_tokens))
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
        token_counter(text_col).alias("n_tokens"),
        F.when(u < F.lit(thr), F.lit("test")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )


def curate_corpus_v2(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    containment_threshold: float = 0.6,
    vocab_size: int = 1000,
    max_oov_frac: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    token_counter: Callable[[str], Column] = TX.token_count,
) -> DataFrame:
    """Round-5 curation funnel with per-source stage accounting:

        quality gate → exact dedup → containment dedup → vocab-coverage
        gate → per-source funnel report

    Beyond ``curate_corpus``: near-SUBSET documents are dropped
    (``ngram_containment_pairs`` — a short doc embedded in a longer
    surviving doc is redundant even when Jaccard says otherwise;
    deterministic rule: drop ``a`` when some surviving ``b`` with a
    smaller id contains it at ≥ threshold), and documents the corpus's
    own top-N vocabulary cannot cover are gated out
    (``vocab_coverage`` — garbage/foreign-script tail). The output is
    the per-source funnel — input → each stage's survivor count →
    final token budget — the report a mixture planner actually reads.

    Every stage is deterministic (min-id survivors, content thresholds,
    exact integer/count arithmetic), so the full composition oracles
    exactly (m42). Scale shape: one fingerprint window + the
    containment inverted-index join (df-capped) + one vocab top-N heap;
    the funnel aggregation itself adds a single source-cardinality
    hash-agg over doc-id-sized markers.
    """
    from novi_pdq_etl_project_prod_spark import cache
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        _gram_pair_counts,
    )
    from novi_pdq_etl_project_prod_spark.operators.text import vocab_coverage

    # Single-pass exit-stage tagging (VERDICT r05 item 4): instead of
    # materializing each stage as its own filtered frame and re-unioning
    # five doc-id-sized branches into the funnel agg (35-exchange plan,
    # two extra corpus scans for the base/quality branches), every doc
    # carries boolean survival flags for each stage and the funnel is ONE
    # wide hash-agg over ONE tagged frame. The per-stage operators still
    # run on exactly the rows today's filters gave them (flag-filtered
    # views of the tagged frame), so the oracle semantics are unchanged.
    base = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"),
        token_counter(text_col).alias("nt"),
    )
    # Exact-dedup survivor among quality docs only: quality rows sort
    # first inside each fingerprint partition, so row_number()==1 ∧ __q
    # is exactly "the min-id quality doc of this fingerprint group" —
    # one window shuffle over the corpus, no pre-filtering needed.
    w = Window.partitionBy(TX.document_fingerprint("text")).orderBy(
        F.col("__q").desc(), F.col(id_col).asc()
    )
    t = (
        base.withColumn(
            "__q", F.col("nt").between(min_tokens, max_tokens)
        )
        .withColumn("__e", F.col("__q") & (F.row_number().over(w) == 1))
    )
    # t feeds the containment miner, the vocab gate, and the funnel agg —
    # without a persist each consumer recomputes the fingerprint window
    # from the scan, and without the eager fill they race the lazy cache
    # (the ngram_jaccard_pairs lesson; measured 7.1s → ~2.6s at sf0.1)
    t = cache.track(t, eager=True)
    # Drop-list straight from the UNDIRECTED pair aggregate (r08 pass
    # fusion, VERDICT r07 item 6): the directed rule "drop a when some
    # surviving b < a contains it at ≥ threshold" is exactly the
    # undirected (id_a < id_b) row with n_common/sz_b ≥ threshold
    # dropping id_b — so the bidirectional explode + directed filter of
    # ngram_containment_pairs is pure overhead here. Semantics (and the
    # m42 oracle) unchanged.
    und = _gram_pair_counts(
        t.where("__e").select(id_col, "text"), id_col=id_col,
        text_col="text", n=3, df_cap=10_000,
    )
    # The containment drop list is (dropped-subset-doc-id)-sized — a
    # fraction of the near-dup mass, orders below the corpus — and the
    # optimizer cannot see that through the miner's plan (it costed
    # these joins sort-merge; VERDICT r06 item 4). The explicit
    # broadcast turns all three consumers (left flag join + two
    # anti-joins) into hash joins against a few-MB id set. PERSISTED
    # eagerly (r08): it feeds both the c_text anti-join and the tagged
    # flag join, and without the cache the whole pair miner — the
    # funnel's dominant stage — executed once per consumer (measured
    # 2.0× the miner wall at sf0.1).
    dropc = F.broadcast(
        cache.track(
            und.where(
                F.col("n_common").cast("double") / F.col("sz_b")
                >= containment_threshold
            )
            .select(F.col("id_b").alias(id_col))
            .distinct()
            .withColumn("__cdrop", F.lit(True)),
            eager=True,
        )
    )
    # Text only ever flows into the per-stage operators via column-pruned
    # reads of the cached frame — never through a join. The flag joins
    # below run on a narrow (id, source, nt, flags) projection: shuffling
    # ids+ints is cheap at any scale, shuffling document text is not.
    # vocab_coverage reads its input twice (vocab build + scoring join);
    # cache the survivor text so the anti-join chain runs once.
    c_text = cache.track(
        t.where("__e").select(id_col, "text").join(
            dropc.select(id_col), id_col, "left_anti"
        ),
        eager=True,
    )
    vc = vocab_coverage(
        c_text, id_col=id_col, text_col="text", vocab_size=vocab_size,
    )
    vfail = (
        vc.where(F.col("oov_frac") > max_oov_frac)
        .select(id_col)
        .withColumn("__vfail", F.lit(True))
    )
    narrow = t.select(id_col, "source", "nt", "__q", "__e")
    tagged = (
        narrow.join(dropc, id_col, "left")
        .withColumn("__c", F.col("__e") & F.col("__cdrop").isNull())
        .join(vfail, id_col, "left")
        .withColumn("__f", F.col("__c") & F.col("__vfail").isNull())
    )
    zero = F.lit(0).cast("long")
    cnt = lambda flag: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col(flag), 1)), zero
    )
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input"),
        cnt("__q").alias("n_quality"),
        cnt("__e").alias("n_exact"),
        cnt("__c").alias("n_containment"),
        cnt("__f").alias("n_final"),
        F.coalesce(
            F.sum(F.when(F.col("__f"), F.col("nt"))), zero
        ).alias("tokens_final"),
    )
