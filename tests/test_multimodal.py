"""Multimodal plumbing tests: schemas, frame reassembly, feature math,
decode-stub contract, and the ASCII precondition the frame-sample oracle
relies on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.multimodal import (
    byte_histogram_features,
    decode_image,
    documents_as_assets,
    fake_decode,
    frame_sample,
)
from dffoo_data_pipeline_spark.multimodal.assets import FRAME_BYTES
from dffoo_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def assets(spark):
    return documents_as_assets(load_table(spark, SF_SMOKE, "documents"))


def test_asset_schema_and_ascii_precondition(spark, assets):
    f = dict((x.name, x.dataType.simpleString()) for x in assets.schema.fields)
    assert f["payload"] == "binary"
    assert f["meta"].startswith("struct<n_bytes:")
    # byte length == char length ⇒ corpus is ASCII ⇒ the DuckDB oracle's
    # character slicing matches our byte slicing
    d = load_table(spark, SF_SMOKE, "documents")
    n_bad = d.filter(F.length(F.encode("text", "UTF-8")) != F.length("text")).count()
    assert n_bad == 0


def test_frames_reassemble_payload(spark, assets):
    # every_k=1: concatenated frames must equal the original payload
    one = assets.limit(20)
    frames_df = (
        one.withColumn(
            "frame",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.length("payload") / FRAME_BYTES).cast("int") - 1,
                    ),
                    lambda i: F.col("payload").substr(
                        i * FRAME_BYTES + 1, F.lit(FRAME_BYTES)
                    ),
                )
            ),
        )
        .groupBy("asset_id")
        .agg(F.concat_ws("", F.collect_list(F.col("frame").cast("string"))).alias("re"))
    )
    orig = one.select("asset_id", F.col("payload").cast("string").alias("txt"))
    joined = orig.join(frames_df, "asset_id")
    assert joined.filter(F.col("re") != F.col("txt")).count() == 0


def test_frame_sample_counts(spark, assets):
    got = frame_sample(assets, every_k=4)
    per_asset = got.groupBy("asset_id").count()
    expect = assets.select(
        "asset_id",
        F.ceil(F.col("meta.n_frames") / 4).cast("long").alias("want"),
    )
    bad = per_asset.join(expect, "asset_id").filter(F.col("count") != F.col("want"))
    assert bad.count() == 0


def test_byte_histogram_matches_numpy(spark, assets):
    rows = byte_histogram_features(assets.limit(10), bins=16).collect()
    payloads = {r["asset_id"]: r["payload"] for r in assets.limit(10).collect()}
    for r in rows:
        b = np.frombuffer(bytes(payloads[r["asset_id"]]), dtype=np.uint8)
        want = np.bincount(b // 16, minlength=16)[:16] / len(b)
        assert np.allclose(r["features"], want)
        assert abs(r["byte_mean"] - b.mean()) < 1e-9
        assert abs(r["byte_std"] - b.std()) < 1e-9
        assert abs(sum(r["features"]) - 1.0) < 1e-9


def test_byte_histogram_rows_integer_exact(spark, assets):
    """The hash-verifiable twin: integer counts/moments must equal numpy's
    exactly (no tolerance — the oracle comparison is value-exact), every
    asset must emit all 16 bins, and the per-asset counts must sum to
    n_bytes."""
    from dffoo_data_pipeline_spark.multimodal import byte_histogram_rows

    # one materialized sample drives both sides: two independent
    # .limit(10) executions are not guaranteed to pick the same rows
    sample = assets.limit(10).collect()
    payloads = {r["asset_id"]: r["payload"] for r in sample}
    picked = assets.where(F.col("asset_id").isin(list(payloads)))
    rows = byte_histogram_rows(picked, bins=16).collect()
    by_asset: dict = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == set(payloads)
    for aid, rs in by_asset.items():
        b = np.frombuffer(bytes(payloads[aid]), dtype=np.uint8).astype(np.int64)
        want = np.bincount(b // 16, minlength=16)[:16]
        assert sorted(r["bin"] for r in rs) == list(range(16))
        for r in rs:
            assert r["cnt"] == int(want[r["bin"]])
            assert r["n_bytes"] == len(b)
            assert r["byte_sum"] == int(b.sum())
            assert r["byte_sumsq"] == int((b * b).sum())
        assert sum(r["cnt"] for r in rs) == len(b)


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", "image/png")
    px = fake_decode(b"0123456789", width=4, height=3)
    assert px.shape == (3, 4) and px.dtype == np.uint8
    # deterministic: same input → same grid
    assert (px == fake_decode(b"0123456789", width=4, height=3)).all()


def test_audio_rms_matches_numpy(spark, assets):
    from dffoo_data_pipeline_spark.multimodal.assets import audio_rms_windows

    sample = assets.limit(5)
    rows = audio_rms_windows(sample, window_samples=64).collect()
    payloads = {r["asset_id"]: bytes(r["payload"]) for r in sample.collect()}
    assert rows, "expected at least one window"
    for r in rows[:50]:
        x = np.frombuffer(payloads[r.asset_id], dtype=np.uint8).astype(float) - 128.0
        seg = x[r.window_no * 64 : (r.window_no + 1) * 64]
        assert abs(r.rms - float(np.sqrt(np.mean(seg * seg)))) < 1e-9


def test_frame_sample_tolerates_empty_payload(spark):
    """ADVICE r1: sequence(0, -1, k) threw on empty payloads; an empty
    document must contribute zero frames, not fail the query."""
    docs = spark.createDataFrame(
        [(1, "some real content here"), (2, "")], "doc_id long, text string"
    )
    out = frame_sample(documents_as_assets(docs))
    ids = [r.asset_id for r in out.collect()]
    assert 1 in ids and 2 not in ids


def test_phash_pair_quality(spark):
    """Identical images share a hash (exact group), a one-char payload
    edit stays within the Hamming budget (near-dup found), unrelated
    images don't pair."""
    from dffoo_data_pipeline_spark.multimodal.assets import (
        image_ahash_codes,
        phash_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    # ids ≡ 0 (mod 3): image modality; ≡ 0 (mod 512/256): identical
    # decode dims, so same payload ⇒ same pixel grid ⇒ same hash
    docs = spark.createDataFrame(
        [
            (0, base),
            (1536, base),  # exact duplicate payload, same decode dims
            # near-identical: edit INSIDE the decoded region (16×16 dims
            # consume the first 256 payload bytes; a tail edit would be
            # invisible to the hash, and correctly so)
            (3072, base[:96] + " " * 8 + base[104:]),  # Hamming 5 from base
            (9, "completely different pixels " + "zzz " * 40),
        ],
        "doc_id long, text string",
    )
    assets = documents_as_assets(docs)
    out = {
        r.asset_id: r
        for r in phash_neardup(image_ahash_codes(assets)).collect()
    }
    assert out[0].phash == out[1536].phash
    assert out[1536].n_same_hash == 2 and out[1536].near_dup_of == 0
    assert out[3072].near_dup_of in (0, 1536)  # tail edit: within budget
    assert out[9].near_dup_of is None and out[9].n_same_hash == 1
    assert out[0].near_dup_of is None  # lowest id is the keeper


def test_audio_activity_segments_islands(spark):
    from dffoo_data_pipeline_spark.multimodal.assets import audio_activity_segments

    # windows: [loud, loud, quiet, loud, quiet, quiet, loud] per the rms
    # column — expect islands [0,1], [3,3], [6,6]
    rows = [
        (1, 0, 100.0), (1, 1, 55.0), (1, 2, 0.0), (1, 3, 80.0),
        (1, 4, 3.0), (1, 5, 19.9), (1, 6, 21.0),
        (2, 0, 5.0),  # entirely quiet asset: no segments
    ]
    df = spark.createDataFrame(rows, "asset_id long, window_no int, rms double")
    got = sorted(
        (r.asset_id, r.start_window, r.end_window, r.n_windows)
        for r in audio_activity_segments(df).collect()
    )
    assert got == [(1, 0, 1, 2), (1, 3, 3, 1), (1, 6, 6, 1)]


def test_audio_segments_from_constructed_payload(spark):
    from dffoo_data_pipeline_spark.multimodal.assets import (
        audio_activity_segments,
        audio_rms_windows,
    )

    quiet = bytes([128]) * 256          # RMS 0
    loud = bytes([28, 228]) * 128       # RMS 100
    payload = loud * 2 + quiet * 3 + loud  # windows: A A q q q A
    df = spark.createDataFrame([(7, payload)], "asset_id long, payload binary")
    rms = audio_rms_windows(df)
    got = sorted(
        (r.start_window, r.end_window, float(r.mean_rms))
        for r in audio_activity_segments(rms).collect()
    )
    assert got == [(0, 1, 100.0), (5, 5, 100.0)]


def test_registered_audio_segments_rows(spark, sf_dir):
    from dffoo_data_pipeline_spark.multimodal.assets import multimodal_audio_segments

    df = multimodal_audio_segments(spark, sf_dir)
    assert df.count() >= 0 and len(df.schema.fields) == 5
