"""Multimodal plumbing: binary columns through mapInPandas batches —
schema, partitioning, stubbed decode, resize (operators/multimodal)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
    decode_image,
    extract_features,
    resize_images,
    synthetic_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError, match="PIL|libvips"):
        decode_image(b"xx")


def test_decode_uses_pil_when_importable(monkeypatch):
    """JPEG (non-PNG) payloads route through PIL when it is importable —
    wiring exercised with a stub PIL module (the container ships no
    Pillow; any environment that has it gets real JPEG decode with no
    code change)."""
    import sys
    import types

    import numpy as np

    class FakeImg:
        width, height, n_frames = 8, 6, 1
        mode = "I;16"  # 16-bit source: bit_depth must come from mode, not a constant

        def convert(self, mode):
            assert mode == "L"
            return np.full((6, 8), 127.5)

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda buf: FakeImg()
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    out = decode_image(b"\xff\xd8\xff\xe0 not-really-a-jpeg")
    assert (out["width"], out["height"], out["n_frames"]) == (8, 6, 1)
    assert out["bit_depth"] == 16  # derived from the source mode (ADVICE r3)
    assert abs(out["mean_intensity"] - 0.5) < 1e-9


def test_extract_features_schema_and_counts(spark):
    media = synthetic_media(spark, n=64)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 64
    by_id = {r["asset_id"]: r for r in rows}
    # payload hash matches a locally computed one (the batch path didn't
    # mangle binary data) — asset 3 is an image, now a real PNG
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import synth_png

    payload = synth_png(3, 64 + 3, 48 + 3)
    assert by_id[3]["payload_sha256"] == hashlib.sha256(payload).hexdigest()
    assert by_id[3]["payload_bytes"] == len(payload)
    # images get intensities; so do real-AVI videos (r4); audio and
    # opaque-container videos don't
    media_rows = {r["asset_id"]: r for r in media.collect()}
    for r in rows:
        src = media_rows[r["asset_id"]]
        if r["media_type"] == "image" or (
            r["media_type"] == "video" and bytes(src["payload"])[:4] == b"RIFF"
        ):
            assert 0.0 <= r["mean_intensity"] <= 1.0
        else:
            assert r["mean_intensity"] is None
    # videos sample ≥1 frame
    assert all(r["n_frames_sampled"] >= 1 for r in rows if r["media_type"] == "video")


def test_audio_wav_decode_is_real(spark):
    """Audio payloads are genuine WAV/PCM and the decode is a REAL stdlib
    wave parse: a sine of amplitude A has RMS ≈ A/√2."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        decode_audio,
        synth_wav,
    )

    meta = decode_audio(synth_wav(1))
    assert meta["sample_rate"] == 8000 and meta["channels"] == 1
    assert meta["duration_ms"] == 100  # i=1 → 100 ms
    expected_rms = (12000 / 32768.0) / 2**0.5
    assert abs(meta["rms"] - expected_rms) < 0.01

    feats = extract_features(synthetic_media(spark, n=32)).collect()
    for r in feats:
        if r["media_type"] == "audio":
            assert r["sample_rate"] == 8000
            assert abs(r["audio_rms"] - expected_rms) < 0.01
        else:
            assert r["sample_rate"] is None and r["audio_rms"] is None


def test_extract_features_deterministic(spark):
    media = synthetic_media(spark, n=16)
    a = {r["asset_id"]: r["payload_sha256"] for r in extract_features(media).collect()}
    b = {r["asset_id"]: r["payload_sha256"] for r in extract_features(media).collect()}
    assert a == b


def test_resize_only_images_and_bounds(spark):
    media = synthetic_media(spark, n=30)
    out = resize_images(media, max_side=32).collect()
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert max(r["width"], r["height"]) <= 32
        assert len(r["payload"]) >= 1


def test_png_round_trip_header_and_pixels():
    """synth_png produces a spec-valid PNG; decode_image parses the real
    header and reconstructs filter-0 pixel data (no codec library)."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        decode_image,
        synth_png,
    )

    p = synth_png(7, 70, 55)
    d = decode_image(p)  # real path — no deterministic_fake needed
    assert (d["width"], d["height"], d["bit_depth"]) == (70, 55, 8)
    assert 0.0 <= d["mean_intensity"] <= 1.0
    # the mean is over sha256-seeded bytes — near 0.5, never degenerate
    assert 0.3 < d["mean_intensity"] < 0.7


def test_avi_roundtrip_real_decode():
    """synth_avi writes a genuine RIFF/AVI; decode_video reads dims,
    frame count and fps from the headers and samples real raw frames —
    no codec, no fake."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        _AVI_FPS,
        decode_video,
        is_avi,
        sample_frames,
        synth_avi,
    )

    for i in (0, 1, 4, 7):
        payload = synth_avi(i)
        assert is_avi(payload)
        d = decode_video(payload)
        assert (d["width"], d["height"]) == (16, 12)
        assert d["n_frames"] == 3 + i % 5
        assert d["fps"] == float(_AVI_FPS)
        # 1 fps sampling over fps=4: every 4th frame, at least one
        import math
        assert d["n_frames_sampled"] == max(1, math.ceil(d["n_frames"] / _AVI_FPS))
        assert 0.0 < d["mean_intensity"] < 1.0
        # deterministic: same asset index → identical stats
        assert decode_video(synth_avi(i)) == d
        # the real path needs no deterministic_fake flag
        assert sample_frames(payload, None) == d["n_frames_sampled"]


def test_extract_features_real_avi_rows(spark):
    """Video rows with AVI payloads get REAL frame sampling and mean
    intensity through the batch pipeline; opaque mp4 rows keep the fake
    path; fake_decode=False only raises for the codec-bound rows."""
    import pytest as _pytest

    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        decode_video,
        extract_features,
        synth_avi,
        synthetic_media,
    )

    media = synthetic_media(spark, n=24)
    out = {r["asset_id"]: r for r in extract_features(media).collect()}
    avi_rows = [
        r for r in media.collect() if r["media_type"] == "video" and bytes(r["payload"])[:4] == b"RIFF"
    ]
    assert avi_rows, "fixture should contain real AVI assets"
    for r in avi_rows:
        d = decode_video(bytes(r["payload"]))
        got = out[r["asset_id"]]
        assert got["n_frames_sampled"] == d["n_frames_sampled"]
        assert got["mean_intensity"] == d["mean_intensity"]
    # opaque mp4 rows: fake 1-frame-per-second
    mp4_rows = [
        r for r in media.collect() if r["media_type"] == "video" and bytes(r["payload"])[:4] != b"RIFF"
    ]
    assert mp4_rows
    for r in mp4_rows:
        assert out[r["asset_id"]]["n_frames_sampled"] == max(1, r["duration_ms"] // 1000)


def test_resize_png_is_real_decode_reencode():
    """resize_png nearest-neighbor-downsamples genuine PNG pixels and
    re-encodes a spec-valid PNG: dims shrink to the bound, the output
    reparses with the same stdlib path, intensity is approximately
    preserved, and at-or-under-bound payloads pass through unchanged."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        decode_image,
        resize_png,
        synth_png,
    )

    src = synth_png(11, 80, 60)
    out, w, h = resize_png(src, 32)
    assert (w, h) == (32, 24)
    d = decode_image(out)  # real stdlib parse of the re-encoded payload
    assert (d["width"], d["height"], d["bit_depth"]) == (32, 24, 8)
    # nearest-neighbor over sha-noise: mean within a few percent
    assert abs(d["mean_intensity"] - decode_image(src)["mean_intensity"]) < 0.05
    # no upscale / no needless re-encode
    assert resize_png(src, 200) == (src, 80, 60)


def test_resize_images_real_path_through_pipeline(spark):
    """The batch resize produces valid PNGs with real pixel content for
    every PNG asset — and fake_decode=False succeeds now that the
    fixture's images are all stdlib-parseable PNGs."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        decode_image,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, n=18)
    out = resize_images(media, max_side=32, fake_decode=False).collect()
    assert len(out) == media.filter("media_type = 'image'").count()
    for r in out:
        assert max(r["width"], r["height"]) <= 32
        d = decode_image(bytes(r["payload"]))
        assert (d["width"], d["height"]) == (r["width"], r["height"])


def test_dhash_stable_and_edit_tolerant(spark):
    """dHash: identical bytes → identical hash; a single-pixel edit stays
    within the banded-join Hamming bound; independent noise images are
    far apart."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        dhash64,
        perturb_png,
        synth_png,
    )

    a = synth_png(1, 64, 48)
    assert dhash64(a) == dhash64(bytes(a))
    edited = perturb_png(a)
    assert edited != a  # bytes differ → sha256 dedup is blind
    d = bin((dhash64(a) ^ dhash64(edited)) & (2**64 - 1)).count("1")
    assert d <= 3
    b = synth_png(2, 64, 48)
    far = bin((dhash64(a) ^ dhash64(b)) & (2**64 - 1)).count("1")
    assert far > 10


def test_dhash_survives_resize_on_smooth_image(spark):
    """Rescaled-copy detection on a smooth (natural-image-like) gradient:
    nearest-neighbor downsample preserves the block-gradient structure,
    so the resized copy pairs with the original."""
    import numpy as np

    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        dhash64,
        encode_png,
        resize_png,
    )

    y, x = np.mgrid[0:96, 0:128]
    smooth = (x / 127.0 * 160 + y / 95.0 * 60 + 10 * np.sin(x / 60.0)).astype(
        np.uint8
    )
    img = encode_png(np.stack([smooth] * 3, axis=2))
    for side in (40, 48, 80):
        resized, nw, nh = resize_png(img, side)
        assert max(nw, nh) == side and resized != img
        d = bin((dhash64(img) ^ dhash64(resized)) & (2**64 - 1)).count("1")
        assert d <= 3, (side, d)


def test_image_near_dup_pairs_connect_plants(spark):
    """The registry entry finds exactly the planted edited + relanded
    copies, each at the expected id offset, all within the bound."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        multimodal_image_near_dup,
    )

    rows = multimodal_image_near_dup(spark, "").collect()
    edited = {(r["asset_id_a"], r["asset_id_b"]) for r in rows if r["asset_id_b"] < 200000}
    relanded = {(r["asset_id_a"], r["asset_id_b"]) for r in rows if r["asset_id_b"] >= 200000}
    assert edited == {(i, i + 100000) for i in range(0, 96, 9)}
    assert relanded == {(i, i + 200000) for i in range(3, 96, 9)}
    assert all(r["hamming"] == 0 for r in rows if r["asset_id_b"] >= 200000)
    assert all(r["hamming"] <= 3 for r in rows)


def test_audio_fingerprint_volume_scale_invariant():
    """Floor-halving the samples preserves every (x >= 0) sign, so the
    fingerprint is bit-identical; a different-frequency recording lands
    far away in Hamming space."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        audio_fingerprint64,
        scale_wav,
        synth_wav,
    )

    a = synth_wav(1)
    assert audio_fingerprint64(a) == audio_fingerprint64(scale_wav(a))
    assert audio_fingerprint64(a) == audio_fingerprint64(scale_wav(a, shift=3))
    b = synth_wav(7)  # different frequency
    ha, hb = audio_fingerprint64(a), audio_fingerprint64(b)
    assert bin((ha ^ hb) & (2**64 - 1)).count("1") > 3


def test_audio_fingerprint_rejects_non_wav():
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        audio_fingerprint64,
    )

    assert audio_fingerprint64(b"not a wav at all") is None


def test_audio_near_dup_connects_planted_copies(spark):
    """The registry entry pairs every planted volume-scaled copy and every
    byte-identical re-land with its source at Hamming 0."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        multimodal_audio_near_dup,
    )

    pairs = multimodal_audio_near_dup(spark, "unused").collect()
    by_pair = {(r["asset_id_a"], r["asset_id_b"]): r["hamming"] for r in pairs}
    # audio assets are i % 3 == 1 within n=96; scaled plants at % 9 == 1,
    # relands at % 9 == 4
    scaled_sources = [i for i in range(96) if i % 3 == 1 and i % 9 == 1]
    reland_sources = [i for i in range(96) if i % 3 == 1 and i % 9 == 4]
    for s in scaled_sources:
        assert by_pair.get((s, s + 100000)) == 0, (s, "scaled copy missing")
    for s in reland_sources:
        assert by_pair.get((s, s + 200000)) == 0, (s, "reland missing")


def _darken_avi(payload: bytes) -> bytes:
    """Halve every frame byte in place — a global brightness change with
    identical container bytes elsewhere (test helper)."""
    import struct

    import numpy as np

    buf = bytearray(payload)

    def walk(pos, end):
        while pos + 8 <= end:
            fourcc = bytes(buf[pos : pos + 4])
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            ds = pos + 8
            if fourcc == b"LIST":
                walk(ds + 4, ds + size)
            elif fourcc[2:4] in (b"db", b"dc"):
                arr = np.frombuffer(bytes(buf[ds : ds + size]), dtype=np.uint8) >> 1
                buf[ds : ds + size] = arr.tobytes()
            pos = ds + size + (size % 2)

    walk(12, len(buf))
    return bytes(buf)


def test_video_fingerprint_remux_and_brightness_invariant():
    """Re-muxing (same frames, new container bytes) AND a global
    brightness halving keep the fingerprint bit-identical; codec-bound
    payloads return None; different footage lands far beyond the Hamming
    threshold (bit TILING amplifies short-clip differences — zero
    padding used to leave two 3-frame clips ≤8 bits apart)."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        remux_avi,
        synth_avi,
        video_fingerprint64,
    )

    for i in (3, 5, 11):  # includes 3- and 4-frame short clips
        a = synth_avi(i)
        fa = video_fingerprint64(a)
        assert fa is not None
        assert video_fingerprint64(remux_avi(a)) == fa
        assert remux_avi(a) != a
        assert video_fingerprint64(_darken_avi(a)) == fa
    assert video_fingerprint64(b"not an avi") is None
    pairs = [(3, 6), (5, 11), (2, 14)]
    for i, j in pairs:
        ham = bin(
            (video_fingerprint64(synth_avi(i)) ^ video_fingerprint64(synth_avi(j)))
            & (2**64 - 1)
        ).count("1")
        assert ham > 3, (i, j, ham)


def test_video_near_dup_connects_planted_copies(spark):
    """Each planted re-muxed copy and byte-identical re-land pairs with
    its source at Hamming 0; codec-bound mp4 rows never emit pairs."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        multimodal_video_near_dup,
    )

    pairs = multimodal_video_near_dup(spark, "unused").collect()
    by_pair = {(r["asset_id_a"], r["asset_id_b"]): r["hamming"] for r in pairs}
    # video assets: i % 3 == 2 within n=96; real AVI iff (i//3) % 3 != 2
    def is_avi_idx(i):
        return (i // 3) % 3 != 2

    remux_sources = [
        i for i in range(96) if i % 3 == 2 and i % 9 == 2 and is_avi_idx(i)
    ]
    reland_sources = [
        i for i in range(96) if i % 3 == 2 and i % 9 == 5 and is_avi_idx(i)
    ]
    assert remux_sources and reland_sources  # fixture actually plants both
    for s in remux_sources:
        assert by_pair.get((s, s + 100000)) == 0, (s, "remuxed copy missing")
    for s in reland_sources:
        assert by_pair.get((s, s + 200000)) == 0, (s, "reland missing")


def test_audio_fingerprint_handles_all_pcm_widths():
    """8/16/24/32-bit PCM all fingerprint (24-bit crashed pre-review-fix:
    '<i4' frombuffer on a non-multiple-of-4 buffer); sign structure is
    preserved across widths for the same waveform."""
    import io
    import wave

    import numpy as np

    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        audio_fingerprint64,
    )

    t = np.arange(801, dtype=np.float64)  # odd length → 3*801 not %4
    sig = np.sin(2 * np.pi * 440.0 * t / 8000.0)

    def pcm(width):
        if width == 1:
            raw = ((sig * 100) + 128).astype(np.uint8).tobytes()
        elif width == 2:
            raw = (sig * 12000).astype("<i2").tobytes()
        elif width == 3:
            s = (sig * 3_000_000).astype(np.int32)
            b = np.zeros((len(s), 3), dtype=np.uint8)
            b[:, 0] = s & 0xFF
            b[:, 1] = (s >> 8) & 0xFF
            b[:, 2] = (s >> 16) & 0xFF
            raw = b.tobytes()
        else:
            raw = (sig * 200_000_000).astype("<i4").tobytes()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            w.writeframes(raw)
        return buf.getvalue()

    fps = {w: audio_fingerprint64(pcm(w)) for w in (1, 2, 3, 4)}
    assert all(v is not None for v in fps.values())
    # same waveform, same sign structure → identical fingerprints for the
    # signed widths (8-bit is offset-binary; sign pattern still matches
    # after the -128 recentering)
    assert fps[2] == fps[3] == fps[4] == fps[1]


def test_dedup_rate_curve_empty_corpus_keeps_bars(spark):
    """Zero verified pairs must still emit one row per threshold bar with
    n_pairs=0 (the oracle's LEFT JOIN shape — review r5)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        CURVE_THRESHOLDS,
        corpus_dedup_rate_curve,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"totally unique document number {i} "
                f"with words {i*7} {i*13} {i*29}", lang="en", source="s",
                n_chars=10)
            for i in range(8)
        ]
    )
    d = tempfile.mkdtemp()
    try:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        rows = corpus_dedup_rate_curve(spark, d).collect()
        assert len(rows) == len(CURVE_THRESHOLDS)
        assert all(r["n_pairs"] == 0 for r in rows)
    finally:
        shutil.rmtree(d)


def test_planted_check_columns_all_found(spark):
    """The in-band n_planted/n_planted_found columns (VERDICT r7 #3) must
    report full plant recovery on every media registry entry — this is
    the pytest floor behind the driver's rows-only checks."""
    from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
        multimodal_audio_near_dup,
        multimodal_features,
        multimodal_image_near_dup,
        multimodal_video_near_dup,
    )

    for fn in (
        multimodal_features,
        multimodal_image_near_dup,
        multimodal_audio_near_dup,
        multimodal_video_near_dup,
    ):
        row = fn(spark, "unused").select("n_planted", "n_planted_found").first()
        assert row["n_planted"] > 0, fn.__name__
        assert row["n_planted_found"] == row["n_planted"], (
            fn.__name__,
            row.asDict(),
        )
