"""Round-6 operator tests: pluggable BPE token accounting (VERDICT r05
item 6)."""

from __future__ import annotations

import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.text import (
    BPE_FIXTURE_VOCAB,
    bpe_vocab_token_count,
    dup_adjusted_token_stats,
)
from tests.conftest import SF_ORACLE


def _py_bpe_count(text: str | None, vocab=BPE_FIXTURE_VOCAB) -> int:
    """Local reference: greedy longest-match-first, 1-char fallback."""
    if text is None:
        return 0
    by_len = sorted(vocab, key=len, reverse=True)
    n = 0
    for w in re.findall(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]", text):
        i = 0
        while i < len(w):
            step = 1
            for p in by_len:
                if w.startswith(p, i):
                    step = len(p)
                    break
            i += step
            n += 1
    return n


def test_bpe_count_matches_local_model_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(200)
    rows = docs.select(
        "doc_id", "text", bpe_vocab_token_count("text").alias("n")
    ).collect()
    assert rows
    for r in rows:
        assert r.n == _py_bpe_count(r.text), f"doc {r.doc_id}"


def test_bpe_count_edge_cases(spark):
    texts = ["", None, "the", "THE", "a", "...", "inginging", "x" * 50]
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(texts)])
    out = {r.i: r.n for r in df.select(
        "i", bpe_vocab_token_count("t").alias("n")
    ).collect()}
    for i, t in enumerate(texts):
        assert out[i] == _py_bpe_count(t), repr(t)
    # sanity anchors: "the" is one vocab piece; case-sensitive fallback
    assert out[2] == 1 and out[3] == 3
    # "inginging" = 3 × "ing"
    assert out[6] == 3


def test_funnel_accepts_pluggable_counter(spark):
    from novi_pdq_etl_project_prod_spark import cache
    from novi_pdq_etl_project_prod_spark.plans.curation import curate_corpus_v2

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = curate_corpus_v2(
        docs, min_tokens=10, max_tokens=2000,
        token_counter=bpe_vocab_token_count,
    ).collect()
    cache.release()
    assert out
    for r in out:
        # funnel monotonicity holds under any counter
        assert (
            r.n_input >= r.n_quality >= r.n_exact
            >= r.n_containment >= r.n_final >= 0
        )
        assert r.tokens_final >= r.n_final  # every surviving doc ≥ 1 token


def test_dup_adjusted_stats_accept_pluggable_counter(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="the cat"),
            Row(doc_id=2, source="a", text="the cat"),  # exact dup
            Row(doc_id=3, source="b", text="unrelated words"),
        ]
    )
    out = {
        r.grp: r
        for r in dup_adjusted_token_stats(
            df, token_counter=bpe_vocab_token_count
        ).collect()
    }
    expect_ab = _py_bpe_count("the cat")
    assert out["a"].raw_tokens == 2 * expect_ab
    assert out["a"].unique_tokens == expect_ab
    assert out["b"].unique_tokens == _py_bpe_count("unrelated words")


# ---------------------------------------------------------------------------
# Broadened image-codec profile (VERDICT r05 item 7)
# ---------------------------------------------------------------------------

def test_resize_rgb_rgba_pixel_exact(spark):
    import numpy as np

    from novi_pdq_etl_project_prod_spark.operators.multimodal import (
        _png_pixels,
        resize_images,
        synthetic_color_png_bytes,
    )

    rows = []
    for i in range(8):
        rows.append(Row(media_id=i, payload=bytearray(synthetic_color_png_bytes(i, 3))))
        rows.append(Row(media_id=100 + i, payload=bytearray(synthetic_color_png_bytes(i, 4))))
    out = {
        r.media_id: r
        for r in resize_images(spark.createDataFrame(rows), 5, 7).collect()
    }
    for r0 in rows:
        src = _png_pixels(bytes(r0.payload))
        h, w, c = src.shape
        expect = src[(np.arange(7) * h) // 7][:, (np.arange(5) * w) // 5, :]
        r = out[r0.media_id]
        assert r.ok and (r.width, r.height) == (5, 7)
        got = _png_pixels(bytes(r.payload))
        assert got.shape[2] == c, "channel layout must survive the resize"
        assert np.array_equal(got, expect)


def test_resize_poison_pills_still_null(spark):
    from novi_pdq_etl_project_prod_spark.operators.multimodal import (
        resize_images,
        synthetic_jpeg_bytes,
    )

    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(b"junk")),
            Row(media_id=2, payload=None),
            # JPEG is header-extractable but not pixel-decodable: poison
            # for the resizer by design
            Row(media_id=3, payload=bytearray(synthetic_jpeg_bytes(5))),
        ]
    )
    rows = {r.media_id: r for r in resize_images(df, 4, 4).collect()}
    for mid in (1, 2, 3):
        assert not rows[mid].ok and rows[mid].payload is None


def test_jpeg_dimension_extraction_in_decode(spark):
    from novi_pdq_etl_project_prod_spark.operators.multimodal import (
        decode_and_featurize,
        synthetic_jpeg_bytes,
    )

    df = spark.createDataFrame(
        [
            Row(media_id=i, modality="image",
                payload=bytearray(synthetic_jpeg_bytes(i)))
            for i in range(6)
        ]
    )
    out = {r.media_id: r for r in decode_and_featurize(df).collect()}
    for i in range(6):
        assert out[i].width == 16 + i % 240
        assert out[i].height == 16 + (i // 16) % 240
        assert out[i].feature is not None and len(out[i].feature) == 16


# ---------------------------------------------------------------------------
# Real-vocabulary BPE (VERDICT r06 item 6): stdlib vocab parsers + the
# broadcast-join segmentation path for production-sized vocabularies,
# parity-tested against a local Python reference greedy segmenter.
# ---------------------------------------------------------------------------

def _py_greedy(word: str, vocab: set, max_len: int) -> int:
    """Reference greedy longest-match-first segmenter (plain Python)."""
    i, n, cnt = 0, len(word), 0
    while i < n:
        step = 1
        for length in range(min(max_len, n - i), 1, -1):
            if word[i:i + length] in vocab:
                step = length
                break
        cnt += 1
        i += step
    return cnt


def _synth_vocab_30k() -> list:
    """Deterministic ~30k-piece syllable-style vocabulary (95 cv +
    1,805 cvc + 9,025 cvcv + ~20k cvcc ≈ 31k pieces)."""
    cons = "bcdfghjklmnpqrstvwz"
    vow = "aeiou"
    pieces = [c + v for c in cons for v in vow]
    pieces += [c + v + c2 for c in cons for v in vow for c2 in cons]
    pieces += [c + v + c2 + v2 for c in cons for v in vow
               for c2 in cons for v2 in vow]
    pieces += [c + v + c2 + c3 for c in cons for v in vow
               for c2 in cons for c3 in cons][:20000]
    pieces += ["the", "ing", "tion", "ment", "er", "ed", "es", "ly"]
    return list(dict.fromkeys(pieces))


def test_bpe_large_path_matches_python_reference(spark):
    import re

    from novi_pdq_etl_project_prod_spark.operators.text import (
        BPE_FIXTURE_VOCAB,
        _bpe_word_tokens_large,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    texts = [r.text for r in docs.limit(200).collect()]
    words = sorted({
        w for t in texts
        for w in re.findall(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]", t)
    })
    # corpus words + adversarial synthetics: piece chains, no-match,
    # single char, long mixed
    words += ["zzzzqqqq", "x", "bakademifosu", "thething", "a1b2c3", "....",
              "supercalifragilistic"]
    wdf = spark.createDataFrame([(w,) for w in set(words)], "_w string")
    for vocab in (list(BPE_FIXTURE_VOCAB), _synth_vocab_30k()):
        vs, ml = set(vocab), max(len(p) for p in vocab)
        got = {r._w: r._ntok for r in _bpe_word_tokens_large(wdf, vocab).collect()}
        for w in set(words):
            assert got[w] == _py_greedy(w, vs, ml), (w, got[w])


def test_bpe_token_counts_routes_large_vocab_identically(spark):
    """The public entry point must give identical counts through the
    inline-HOF and join paths; threshold routing is an implementation
    detail, never a semantics change."""
    import novi_pdq_etl_project_prod_spark.operators.text as TX

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id: r.n_tokens
         for r in TX.bpe_token_counts(docs, vocab=TX.BPE_FIXTURE_VOCAB).collect()}
    # force the large path for the SAME fixture vocab
    import unittest.mock as mock
    with mock.patch.object(TX, "BPE_LARGE_VOCAB_THRESHOLD", 1):
        b = {r.doc_id: r.n_tokens
             for r in TX.bpe_token_counts(docs, vocab=TX.BPE_FIXTURE_VOCAB).collect()}
    assert a == b


def test_load_bpe_vocab_merges_format():
    from novi_pdq_etl_project_prod_spark.operators.text import load_bpe_vocab

    lines = [
        "#version: 0.2",
        "t h",            # -> th
        "th e",           # -> the
        "Ġ t",            # space-marker merge -> 't' (len 1, dropped)
        "i n g",          # malformed 3-token line, skipped
        "t h",            # duplicate, deduped
        "in g",           # -> ing
    ]
    assert load_bpe_vocab(lines) == ["th", "the", "ing"]


def test_load_bpe_vocab_tiktoken_format():
    import base64

    from novi_pdq_etl_project_prod_spark.operators.text import load_bpe_vocab

    lines = [
        base64.b64encode("the".encode()).decode() + " 0",
        base64.b64encode("Ġing".encode()).decode() + " 1",  # marker stripped
        base64.b64encode(b"\xff\xfe").decode() + " 2",       # non-UTF8, skipped
        base64.b64encode("tion".encode()).decode() + " 3",
    ]
    assert load_bpe_vocab(lines) == ["the", "ing", "tion"]
