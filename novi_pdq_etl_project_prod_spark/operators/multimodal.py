"""Multimodal column plumbing (SURVEY.md §7.2 M6): image/audio/video as
opaque ``binary`` columns with typed metadata, processed in Arrow batches
via ``mapInPandas``.

The decode step itself is STUBBED — the container has no image/audio
libraries — behind ``DECODERS``: each modality gets a deterministic fake
decoder so the Spark-side plumbing (schema contract, batch shape,
partition sizing) is real and tested; swapping in Pillow/torchaudio is a
one-function change that does not touch any Spark code.

Scale notes (the part that matters at 100 TB):
- binary payloads ride *with* the rows — size partitions by bytes, not
  row count (``spark.sql.files.maxPartitionBytes``), or store payloads
  out-of-band (object-store URIs) and fetch inside the batch fn.
- ``mapInPandas`` streams Arrow record batches: peak executor memory is
  one batch, not one partition (``spark.sql.execution.arrow.
  maxRecordsPerBatch`` caps it — set it low for fat rows).
- feature extraction emits small fixed-width vectors; do it as early as
  possible so shuffles move features, never raw media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of decoded-image feature rows produced by ``decode_and_featurize``.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_image_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: derives dimensions and a
    16-dim feature from the payload hash. Replace with Pillow + a vision
    model; the signature (bytes -> dict matching IMAGE_FEATURES_SCHEMA
    fields) is the swap point."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feature = [((h[i] / 255.0) * 2 - 1) for i in range(16)]
    return {"width": width, "height": height, "feature": feature}


def _unimplemented_decoder(payload: bytes) -> dict:
    raise NotImplementedError(
        "real media decoding requires libraries not present in this "
        "container; register one via DECODERS['<modality>']"
    )


#: Modality registry. 'image' ships the deterministic fake so plumbing is
#: testable end-to-end; audio/video raise until a real decoder is plugged.
DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": _fake_image_decoder,
    "audio": _unimplemented_decoder,
    "video": _unimplemented_decoder,
}


def attach_binary_metadata(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Cheap JVM-side metadata over opaque binary: byte length + sha256.
    No Python, no decode — this is the projection you run over 100 TB to
    build manifests and exact-dup maps of media."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched decode + feature extraction via ``mapInPandas``.

    Unknown/failing decodes yield null width/height/feature rather than
    failing the job (poison-pill media is a fact of life at scale).
    """

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf[id_col].astype("int64"),
                "modality": pdf[modality_col],
                "n_bytes": pdf[payload_col].map(len).astype("int64"),
                "sha256": pdf[payload_col].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            widths, heights, feats = [], [], []
            for modality, payload in zip(pdf[modality_col], pdf[payload_col]):
                decoder = DECODERS.get(modality)
                try:
                    d = decoder(payload) if decoder else None
                except NotImplementedError:
                    d = None
                widths.append(d["width"] if d else None)
                heights.append(d["height"] if d else None)
                feats.append(d["feature"] if d else None)
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["feature"] = pd.Series(feats, dtype="object")
            yield pd.DataFrame(out)

    return df.mapInPandas(_process, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
    every_nth: int = 30,
) -> DataFrame:
    """Video frame-sampling *plan*: expands (media, frame_count) into
    (media, frame_index) rows JVM-side with ``sequence`` + ``explode`` —
    the shuffle-light manifest a downstream decoder consumes. Decoding
    the sampled frames is the pandas-UDF step above."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_nth)
    )
    return df.select(
        F.col(id_col), F.explode(idx).alias("frame_index")
    )


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Deterministic, content-addressed train/test split: the split
    decision is a pure function of (id, seed) via xxhash64, so it is
    stable across runs, partitionings, and even re-ingestions of the
    same ids — the property a training pipeline needs to avoid
    test-set leakage when data is reprocessed. Adds a ``split`` column
    ('train'/'test'); no shuffle."""
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    return df.withColumn(
        "split",
        F.when(
            bucket < int(test_fraction * 1_000_000), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling via ``sampleBy`` (Bernoulli per row). Use for
    class-balanced subsets; exact-size sampling needs a window over
    random order instead."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def synthetic_media(spark, n: int = 64, modality: str = "image") -> DataFrame:
    """Deterministic fake media table for tests/demos: payload bytes are a
    function of the id (md5-expanded)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.lit(modality).alias("modality"),
            F.sha2(F.col("id").cast("string"), 256)
            .cast("binary")
            .alias("payload"),
        )
    )


def mixture_thresholds(rates: dict) -> dict:
    """Per-source 4-hex-digit thresholds for ``mixture_sample`` (65536
    buckets; rate >= 1.0 keeps everything)."""
    return {
        src: format(min(max(int(round(rate * 65536)), 0), 65535), "04x")
        for src, rate in rates.items()
        if rate < 1.0
    }


def mixture_sample(
    df: DataFrame,
    rates: dict,
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each row with its
    source's target rate, decided by a pure function of (source, id) —
    md5's first 4 hex digits compared against a per-source threshold
    string. Like ``train_test_split`` this is content-addressed: stable
    across runs, partitionings, and engines (md5 and lexicographic hex
    compare agree everywhere), so a rebalanced corpus is reproducible
    bit-for-bit. No shuffle — a row-local filter.

    Training pipelines use this to hit a target domain mixture (e.g.
    down-weight web crawl against books/code) without a global sort or
    per-source count pass.
    """
    u = F.substring(
        F.md5(F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string"))),
        1,
        4,
    )
    thresholds = mixture_thresholds(rates)
    keep = None
    for src, rate in rates.items():
        cond = (
            F.lit(True) if rate >= 1.0 else u < F.lit(thresholds[src])
        )
        branch = F.when(F.col(source_col) == src, cond)
        keep = branch if keep is None else keep.when(F.col(source_col) == src, cond)
    default = (
        F.lit(True)
        if default_rate >= 1.0
        else u < F.lit(format(min(max(int(round(default_rate * 65536)), 0), 65535), "04x"))
    )
    keep = default if keep is None else keep.otherwise(default)
    return df.where(keep)


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly-k-per-stratum sampling, deterministic and content-addressed:
    rank rows within each stratum by md5(seed:id) — a pseudo-random but
    stable total order — and keep the first k. Unlike Bernoulli
    ``sampleBy`` the output size is exact, and unlike ``ORDER BY rand()``
    it is reproducible across runs, partitionings, and engines.

    One shuffle (the window partition); at 100 TB the rank never
    materializes more than k rows per stratum past the filter.
    """
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
