"""Streaming equivalence and multimodal plumbing semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from projectdatalake_spark import streaming as ST
from projectdatalake_spark.operators import multimodal as MM
from projectdatalake_spark.sources import load_table


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = ST.read_events_stream(spark, sf_dir)
    got = ST.run_available_now(ST.tumbling_window_agg(stream))
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_keys_matches_distinct(spark, sf_dir):
    stream = ST.read_events_stream(spark, sf_dir)
    got = ST.run_available_now(
        ST.dedup_keys_stream(stream, ["user_id", "event_type"]), output_mode="append"
    )
    want = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_window_counts_sum_to_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sessions = ST.session_window_agg(ev)
    total = sessions.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()
    # sessions are disjoint per user and end >= start
    bad = sessions.filter(F.col("session_end") <= F.col("session_start"))
    assert bad.count() == 0


def test_chunking_round_trip(spark):
    df = spark.createDataFrame([(1, "a" * 130), (2, "b" * 64), (3, "c")], ["id", "text"])
    chunks = MM.chunk_payload(MM.to_binary(F.col("text")), 64)
    out = df.select(
        "id",
        F.size(chunks).alias("n"),
        # reassembling the chunks must reproduce the payload
        (F.aggregate(
            F.transform(chunks, lambda c: c.cast("string")),
            F.lit(""),
            lambda acc, c: F.concat(acc, c),
        ) == F.col("text")).alias("roundtrip"),
    )
    got = {r.id: (r.n, r.roundtrip) for r in out.collect()}
    assert got == {1: (3, True), 2: (1, True), 3: (1, True)}


def test_decode_features_deterministic_and_arrow_batched(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    payloads = docs.select("doc_id", MM.to_binary(F.col("text")).alias("payload"))
    a = sorted(map(tuple, MM.decode_image_features(payloads).collect()))
    b = sorted(map(tuple, MM.decode_image_features(payloads).collect()))
    assert a == b
    assert len(a) == 50
    # width/height land in the documented envelope
    assert all(64 <= r[2] < 256 and 64 <= r[3] < 256 for r in a)


def test_frame_sampling(spark):
    df = spark.createDataFrame([(1, "x" * 100)], ["id", "text"])
    frames = MM.sample_frames(MM.to_binary(F.col("text")), frame_bytes=10, every_n=3)
    out = df.select(F.size(frames).alias("n")).first()
    # 10 frames, keep 0,3,6,9 → 4
    assert out.n == 4


def test_bmp_ppm_codec_round_trip():
    """Pure-numpy decoder vs independent encoder across stride-padding
    edges (w*3 % 4 ∈ {0,1,2,3}), plus top-down BMP and garbage fallback."""
    import struct

    from projectdatalake_spark.operators.multimodal import (
        _decode_real,
        _fake_decode_features,
        encode_bmp,
        encode_ppm,
    )

    for w in (1, 8, 9, 10, 11, 20):
        for h in (1, 7):
            for px in (0, 128, 255):
                assert _decode_real(encode_bmp(w, h, px)) == (w, h, px / 255.0)
                assert _decode_real(encode_ppm(w, h, px)) == (w, h, px / 255.0)

    # top-down BMP: negative height, rows in top-down order — same pixels
    buf = bytearray(encode_bmp(9, 3, 77))
    struct.pack_into("<i", buf, 22, -3)
    assert _decode_real(bytes(buf)) == (9, 3, 77 / 255.0)

    # truncated pixel array → not decodable → caller falls back to fake
    trunc = encode_bmp(9, 3, 77)[:-5]
    assert _decode_real(trunc) is None
    assert _fake_decode_features(len(trunc))[0] == 64 + len(trunc) % 192

    # PPM with non-255 maxval is out of scope for the numpy path
    assert _decode_real(b"P6\n4 4\n65535\n" + b"\x00" * 96) is None


def test_wav_parser_edges(spark):
    import struct

    from projectdatalake_spark.operators import multimodal as MM

    buf = MM.encode_wav(n_samples=10, sample_rate=8000, n_channels=2, amplitude=5000)
    assert MM._parse_wav(buf) == (8000, 2, 10, 5000.0)
    # extra chunk between fmt and data: the walker must skip it
    fmt_end = 12 + 8 + 16
    junk = struct.pack("<4sI", b"LIST", 5) + b"junk!" + b"\x00"  # odd size, padded
    spliced = buf[:fmt_end] + junk + buf[fmt_end:]
    assert MM._parse_wav(spliced) == (8000, 2, 10, 5000.0)
    # not-a-wav and truncated payloads refuse instead of mis-parsing
    assert MM._parse_wav(b"RIFFxxxxWAVE") is None
    assert MM._parse_wav(b"\x00" * 40) is None
    # unparseable payloads surface as NULL metadata through the kernel
    df = spark.createDataFrame([(1, bytearray(b"not audio"))], ["doc_id", "payload"])
    row = MM.decode_audio_meta(df).first()
    assert row.n_bytes == 9 and row.sample_rate is None and row.rms_amplitude is None


def test_dhash_resolution_invariance_and_decode():
    """The perceptual contract: the SAME gradient pattern rendered at
    different resolutions hashes within a few bits; different patterns
    land far apart. Full-pixel decode round-trips both codecs."""
    import numpy as np

    from projectdatalake_spark.operators.multimodal import (
        _decode_pixels,
        _dhash64,
        encode_bmp_gradient,
        encode_ppm,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h_by_size = {}
    for w, h in ((64, 48), (128, 96), (32, 24)):
        dec = _decode_pixels(encode_bmp_gradient(w, h, seed=5))
        assert dec is not None and dec[0] == w and dec[1] == h
        assert dec[2].shape == (h, w, 3)
        h_by_size[(w, h)] = _dhash64(dec[2])
    vals = list(h_by_size.values())
    assert ham(vals[0], vals[1]) <= 3 and ham(vals[0], vals[2]) <= 3
    other = _dhash64(_decode_pixels(encode_bmp_gradient(64, 48, seed=11))[2])
    assert ham(vals[0], other) > 3  # different pattern past the dedup radius
    # PPM full-pixel decode: flat color → known array
    w, h, px = _decode_pixels(encode_ppm(6, 4, 200))
    assert (w, h) == (6, 4) and px.shape == (4, 6, 3) and int(px.max()) == 200
    assert _decode_pixels(b"\x00\x01garbage") is None


def test_dhash_banded_pairs_exact_vs_brute(spark):
    """4x16 banding is pigeonhole-EXACT at hamming <= 3: the banded join
    finds exactly the brute-force pair set; the unsound threshold is
    refused."""
    import itertools

    import pytest as _pytest

    from projectdatalake_spark.operators import multimodal as MM2

    rows = [
        # 3 rendering sizes x 10 patterns → near-dup groups of 3
        (100 * s + i, bytearray(MM2.encode_bmp_gradient(w, hh, seed=s)))
        for s in range(10)
        for i, (w, hh) in enumerate(((48, 36), (96, 72), (192, 144)))
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = MM2.image_dhash(df).persist()
    assert hashes.filter("decoded").count() == 30
    got = {
        (r.id1, r.id2)
        for r in MM2.dhash_dup_pairs(hashes, max_hamming=3).collect()
    }
    hv = {r.doc_id: r.dhash for r in hashes.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(hv), 2)
        if ham(hv[a], hv[b]) <= 3
    }
    assert got == brute and len(brute) >= 10  # groups actually formed
    with _pytest.raises(ValueError):
        MM2.dhash_dup_pairs(hashes, max_hamming=4)
    hashes.unpersist()


def test_audio_fingerprint_invariances(spark):
    """The perceptual contract for audio: amplitude scaling and appended
    silence leave the landmark set (nearly) unchanged; different tone
    sets land far apart. Matching is an inverted-index join."""
    from projectdatalake_spark.operators import multimodal as MM3

    sr = 8000
    base = MM3.encode_wav_tones(sr * 2, sr, (440.0, 1200.0, 2500.0), 12000)
    quiet = MM3.encode_wav_tones(sr * 2, sr, (440.0, 1200.0, 2500.0), 3000)
    padded = base + b""  # same clip
    import struct

    # appended silence: extend the data chunk with zeros (rebuild RIFF)
    silence = b"\x00\x00" * (sr // 2)
    body = base[44:] + silence
    fmt = base[12:36]
    padded = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body), b"WAVE")
        + fmt
        + struct.pack("<4sI", b"data", len(body))
        + body
    )
    other = MM3.encode_wav_tones(sr * 2, sr, (700.0, 1800.0, 3300.0), 12000)
    df = spark.createDataFrame(
        [
            (1, bytearray(base)),
            (2, bytearray(quiet)),
            (3, bytearray(padded)),
            (4, bytearray(other)),
            (5, bytearray(b"not audio at all")),
        ],
        "doc_id long, payload binary",
    )
    fps = MM3.audio_fingerprint(df).persist()
    rows = {r.doc_id: r for r in fps.collect()}
    assert rows[5].landmarks == [] and rows[5].n_frames == 0
    assert rows[1].landmarks == rows[2].landmarks  # amplitude-invariant
    pairs = {
        (r.id1, r.id2): r.jaccard
        for r in MM3.audio_dup_pairs(fps, min_jaccard=0.6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.6  # silence-padded
    assert (1, 4) not in pairs and (2, 4) not in pairs  # different tones
    fps.unpersist()


def test_audio_constellation_shift_robust_and_order_sensitive(spark):
    """The constellation upgrade's two contracts over per-frame landmark
    Jaccard: (a) SHIFT-ROBUST — a clip cut/padded seconds into the
    original still matches, and the vote histogram recovers the exact
    frame offset; (b) ORDER-SENSITIVE — a clip with the SAME tone
    inventory in reverse order (which landmark Jaccard falsely calls a
    duplicate, its marks carry no timing) gets NO concentrated offset
    and must not pair."""
    from projectdatalake_spark.operators import multimodal as MM3

    sr = 8000
    seg = sr // 4
    mel = [((440.0 + 60 * i, 1400.0 + 90 * i), seg) for i in range(8)]
    base = MM3.encode_wav_melody(sr, mel, 12000)
    shifted = MM3.encode_wav_melody(sr, [((), sr)] + mel, 12000)
    quiet = MM3.encode_wav_melody(sr, mel, 4000)
    reversed_ = MM3.encode_wav_melody(sr, list(reversed(mel)), 12000)
    other = MM3.encode_wav_melody(
        sr, [((523.0 + 71 * i, 1600.0 + 83 * i), seg) for i in range(8)], 12000
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(base)),
            (2, bytearray(shifted)),
            (3, bytearray(other)),
            (4, bytearray(quiet)),
            (5, bytearray(reversed_)),
            (6, bytearray(b"not audio")),
        ],
        "doc_id long, payload binary",
    )
    prints = MM3.audio_constellation(df).persist()
    assert prints.filter("doc_id = 6").count() == 0  # non-WAV: no prints
    got = {
        (r.id1, r.id2): (r.offset, r.votes)
        for r in MM3.audio_constellation_dup_pairs(prints, min_votes=20).collect()
    }
    # shift-robust: 1s of prepended silence = 15.625 hop frames; the
    # silence gate rounds the first sounding frame to 16
    assert got[(1, 2)][0] == -16 and got[(1, 2)][1] >= 100
    # amplitude-invariant at zero offset, every hash voting
    assert got[(1, 4)][0] == 0
    # transitive consistency: shifted vs quiet at the same +16
    assert got[(2, 4)][0] == 16
    # order-sensitive: the reversed melody must NOT pair with anything
    assert not any(5 in p for p in got)
    # different melody: no pair at all
    assert not any(3 in p for p in got)
    # ...while the per-frame landmark rung cannot fingerprint
    # time-varying content AT ALL: its stability gate (mark must sustain
    # >=25% of frames) drops every melody note (~13% each) — zero marks,
    # zero pairs. The constellation rung is what extends audio dedup
    # beyond steady-tone clips.
    fps = MM3.audio_fingerprint(df)
    marks = {r.doc_id: len(r.landmarks) for r in fps.collect()}
    assert marks[1] == 0 and marks[5] == 0
    prints.unpersist()


def test_video_framehash_shift_and_resolution_robust(spark):
    """The video rung's contracts: (a) a clip CUT 4 frames into the
    original matches at exactly offset 4; (b) a re-render at a DIFFERENT
    resolution matches at offset 0 (dHash block means are area-exact, so
    only a few bits flip — recovered by the banded-Hamming join, which
    is pigeonhole-EXACT at d<=3); (c) a reversed clip (same frame SET —
    a set-based matcher would false-positive) scatters one vote per
    scene and never pairs; (d) a different clip and a non-video payload
    produce nothing."""
    from projectdatalake_spark.operators import multimodal as MM3

    def clip(base, n_frames=30, res=40, skip=0, reverse=False):
        frames = [
            MM3.encode_bmp_gradient(res, res, base + i // 2)
            for i in range(skip, n_frames)
        ]
        if reverse:
            frames = list(reversed(frames))
        return MM3.encode_video_frames(frames)

    df = spark.createDataFrame(
        [
            (1, bytearray(clip(100))),
            (2, bytearray(clip(100, skip=4))),
            (3, bytearray(clip(500))),
            (4, bytearray(clip(100, res=64))),
            (5, bytearray(clip(100, reverse=True))),
            (6, bytearray(b"not a video")),
        ],
        "doc_id long, payload binary",
    )
    prints = MM3.video_frame_hashes(df).persist()
    assert prints.filter("doc_id = 6").count() == 0
    got = {
        (r.id1, r.id2): (r.offset, r.votes)
        for r in MM3.video_dup_pairs(prints, min_votes=8).collect()
    }
    assert got[(1, 2)][0] == 4 and got[(1, 2)][1] >= 10
    assert got[(1, 4)][0] == 0
    assert got[(2, 4)][0] == -4
    assert not any(3 in p or 5 in p for p in got)
    # the guarantee boundary is explicit
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MM3.video_dup_pairs(prints, max_hamming=4)
    prints.unpersist()


def test_audio_constellation_rejects_field_overflow_params(spark):
    """The packed pair hash gives dt 8 bits and each frequency bin 10;
    parameters outside those widths must error at entry, not silently
    bleed fields into colliding hashes."""
    import pytest

    from projectdatalake_spark.operators import multimodal as MM3

    df = spark.createDataFrame([(1, bytearray(b""))],
                               "doc_id long, payload binary")
    with pytest.raises(ValueError, match="max_dt"):
        MM3.audio_constellation(df, max_dt=256)
    with pytest.raises(ValueError, match="bins"):
        MM3.audio_constellation(df, frame=4096)
    # boundary values are fine
    MM3.audio_constellation(df, max_dt=255, frame=2046)


def test_image_phash_invariances(spark):
    """pHash contracts the dHash rung cannot make: (a) EXACT invariance
    under contrast scaling (DCT is linear; pixel values are even ints
    halved exactly in float64, so every coefficient-vs-median comparison
    is unchanged bit for bit), (b) EXACT invariance under 2x pixel
    replication (block means recover the identical 32x32 grid), and (c)
    a different pattern lands far away in Hamming space; dup pairing
    reuses the banded join via hash_col."""
    import numpy as np

    from projectdatalake_spark.operators import multimodal as MM3

    def ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype("uint8").tobytes()

    rng = np.random.default_rng(11)
    # non-separable even-valued pattern (separable gradients degenerate
    # the DCT to one row/column — the dHash lesson applies here too)
    base = (rng.integers(0, 128, size=(64, 64, 3)) * 2).astype("uint8")
    half = (base // 2).astype("uint8")          # exact contrast halving
    up2 = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)  # 128x128
    other = (rng.integers(0, 128, size=(64, 64, 3)) * 2).astype("uint8")
    df = spark.createDataFrame(
        [
            (1, bytearray(ppm(base))),
            (2, bytearray(ppm(half))),
            (3, bytearray(ppm(up2))),
            (4, bytearray(ppm(other))),
            (5, bytearray(b"not an image")),
        ],
        "doc_id long, payload binary",
    )
    hashes = MM3.image_phash(df)
    hv = {r.doc_id: (r.phash, r.decoded) for r in hashes.collect()}
    assert hv[1][1] and not hv[5][1]
    assert hv[1][0] == hv[2][0]  # exact under contrast scale
    assert hv[1][0] == hv[3][0]  # exact under 2x replication
    d14 = bin((hv[1][0] ^ hv[4][0]) & ((1 << 64) - 1)).count("1")
    assert d14 > 10, d14
    pairs = {
        (r.id1, r.id2)
        for r in MM3.dhash_dup_pairs(
            hashes, max_hamming=3, hash_col="phash"
        ).collect()
    }
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    assert not any(4 in p or 5 in p for p in pairs)
