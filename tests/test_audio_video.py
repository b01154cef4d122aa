"""Audio (PCM WAV) and video (MJPEG stream) kernel + operator tests:
container round-trips, header-only scans, 8-bit widening, skip-on-error,
and the frame-sampling Spark operator with real per-frame JPEG decode."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from ocr_spark.kernels.jpeg import decode_jpeg, encode_jpeg, split_mjpeg
from ocr_spark.kernels.wav import decode_wav, encode_wav, parse_wav_header
from ocr_spark.operators import multimodal


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    for ch in (1, 2):
        samples = rng.integers(-32768, 32768, size=(37, ch), dtype=np.int16)
        data = encode_wav(samples, rate=22050)
        assert parse_wav_header(data) == (22050, ch, 16, 37)
        got, rate = decode_wav(data)
        assert rate == 22050
        assert np.array_equal(got, samples)


def test_wav_8bit_pcm_decodes_centered():
    # hand-built 8-bit PCM: unsigned samples center at 128 and widen
    import struct

    body = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(body).to_bytes(4, "little") + body + b"\x00"
    data = b"RIFF" + len(chunks).to_bytes(4, "little") + chunks
    assert parse_wav_header(data) == (8000, 1, 8, 3)
    got, rate = decode_wav(data)
    assert got[:, 0].tolist() == [-128 << 8, 0, 127 << 8]


def test_wav_skips_unknown_chunks():
    # LIST/INFO chunks (odd-sized, word-padded) before data must be walked
    samples = np.arange(-5, 5, dtype=np.int16)
    data = bytearray(encode_wav(samples, rate=16000))
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    out = bytes(data[:12]) + extra + bytes(data[12:])
    out = out[:4] + (len(out) - 8).to_bytes(4, "little") + out[8:]
    got, _ = decode_wav(out)
    assert np.array_equal(got[:, 0], samples)


def test_wav_garbage_and_non_pcm_raise():
    with pytest.raises(ValueError):
        parse_wav_header(b"not a riff file at all")
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # 85 = MP3
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    data = b"RIFF" + len(chunks).to_bytes(4, "little") + chunks
    with pytest.raises(NotImplementedError):
        parse_wav_header(data)


def test_mjpeg_split_and_frame_decode():
    frames = [
        encode_jpeg(np.full((8 + i, 10), 40 * i, np.uint8), quality=90)
        for i in range(5)
    ]
    got = split_mjpeg(b"".join(frames))
    assert got == frames
    for i, f in enumerate(got):
        assert (decode_jpeg(f) == 40 * i).all()


def test_mjpeg_split_survives_ffd9_in_segment_payload():
    # an APPn payload containing the EOI byte pair must not split the
    # frame early — the splitter walks markers, it does not grep
    frame = encode_jpeg(np.full((8, 8), 9, np.uint8), quality=90)
    app = b"\xff\xee" + (10).to_bytes(2, "big") + b"ab\xff\xd9cdef"
    patched = frame[:2] + app + frame[2:]
    got = split_mjpeg(patched + frame)
    assert len(got) == 2
    assert (decode_jpeg(got[0]) == 9).all()


def test_audio_ops_spark(spark):
    payloads = [
        (0, encode_wav(np.arange(-8, 8, dtype=np.int16), rate=8000)),
        (1, encode_wav(np.ones((12, 2), dtype=np.int16) * 100, rate=44100)),
        (2, b"garbage not audio"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [p[0] for p in payloads], "payload": [p[1] for p in payloads]}
        )
    )
    meta = multimodal.audio_meta(df).toPandas().set_index("vec_id")
    assert meta.loc[0, ["fmt", "sample_rate", "channels", "n_frames"]].tolist() == [
        "WAV", 8000, 1, 16,
    ]
    assert meta.loc[1, ["sample_rate", "channels", "n_frames"]].tolist() == [
        44100, 2, 12,
    ]
    assert not meta.loc[2, "valid"]

    feats = multimodal.audio_features(df).toPandas().set_index("vec_id")
    assert feats.loc[0, "mean_abs"] == np.abs(np.arange(-8, 8)).mean()
    assert feats.loc[1, "mean_abs"] == 100.0
    assert np.isnan(feats.loc[2, "mean_abs"])


def test_video_frame_sample_spark(spark):
    frames0 = [
        encode_jpeg(np.full((8, 12), v, np.uint8), quality=90) for v in (10, 20, 30, 40)
    ]
    payloads = [(0, b"".join(frames0)), (1, b"no frames here")]
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [p[0] for p in payloads], "payload": [p[1] for p in payloads]}
        )
    )
    out = (
        multimodal.video_frame_sample(df, every_n=2)
        .toPandas()
        .sort_values("frame_idx", ignore_index=True)
    )
    # every 2nd frame of video 0; video 1 skip-and-continue
    assert out["vec_id"].tolist() == [0, 0]
    assert out["frame_idx"].tolist() == [0, 2]
    assert out["mean_px"].tolist() == [10.0, 30.0]
    assert out["width"].tolist() == [12, 12]


def test_mjpeg_truncated_tail_keeps_complete_frames():
    # IP-camera disconnect: the final frame is cut short — the complete
    # frames must survive, not be discarded wholesale
    frames = [
        encode_jpeg(np.full((8, 8), 30 * i, np.uint8), quality=90) for i in range(4)
    ]
    stream = b"".join(frames) + frames[0][:-5]  # truncated 5th frame
    got = split_mjpeg(stream)
    assert got == frames


def test_wav_header_and_decode_agree_on_multi_data_chunk():
    # nonstandard two-data-chunk WAV: metadata and samples must come
    # from the SAME (first) chunk
    samples = np.arange(10, dtype=np.int16)
    data = bytearray(encode_wav(samples, rate=8000))
    extra = b"data" + (4).to_bytes(4, "little") + b"\x01\x00\x02\x00"
    data += extra
    data[4:8] = (len(data) - 8).to_bytes(4, "little")
    rate, ch, bits, n = parse_wav_header(bytes(data))
    got, _ = decode_wav(bytes(data))
    assert n == len(got) == 10


def test_audio_segments_gaps_and_islands(spark):
    import numpy as np

    from ocr_spark.kernels.wav import encode_wav
    from ocr_spark.operators import multimodal

    t = multimodal.AUDIO_SEG_THRESHOLD
    # clip 0: loud run [1..2], silent, loud run [5..5]
    s0 = np.array([0, t, t + 5, 100, -3, -t, 0], dtype="<i2")
    # clip 1: all silent -> no rows
    s1 = np.zeros(8, dtype="<i2")
    # clip 2: all voiced -> one run covering everything (min int16 too)
    s2 = np.array([-32768, 32767, t], dtype="<i2")
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_wav(s0, rate=16000))),
            (1, bytearray(encode_wav(s1, rate=16000))),
            (2, bytearray(encode_wav(s2, rate=16000))),
            (3, bytearray(b"not a wav")),  # skip-and-continue
        ],
        "vec_id long, payload binary",
    )
    out = multimodal.audio_segments(df).collect()
    got = sorted((r.vec_id, r.seg_idx, r.start_frame, r.n_frames, r.peak_abs) for r in out)
    assert got == [
        (0, 0, 1, 2, t + 5),
        (0, 1, 5, 1, t),
        (2, 0, 0, 3, 32768),
    ]


def test_video_scene_cuts_detects_level_jumps(spark):
    import numpy as np

    from ocr_spark.kernels.jpeg import encode_jpeg
    from ocr_spark.operators import multimodal

    def clip(levels, w=8, h=8):
        return b"".join(
            encode_jpeg(np.full((h, w), lv, np.uint8), quality=90)
            for lv in levels
        )

    df = spark.createDataFrame(
        [
            (0, bytearray(clip([10, 10, 200, 205]))),   # cut at frame 2
            (1, bytearray(clip([50, 60]))),             # no cut
            (2, bytearray(b"garbage")),                 # skipped
        ],
        "vec_id long, payload binary",
    )
    out = [
        (r.vec_id, r.frame_idx, r.delta_abs, r.n_frames)
        for r in multimodal.video_scene_cuts(df).collect()
    ]
    assert out == [(0, 2, 190, 4)]


# ---------------------------------------------------- G.711 / ADPCM


def test_g711_tables_match_cpython_reference():
    # audioop is CPython's C implementation of the same CCITT
    # reference code — a fully independent oracle for all 256 codes
    audioop = pytest.importorskip("audioop")
    from ocr_spark.kernels.wav import alaw_decode, mulaw_decode

    all_bytes = bytes(range(256))
    mu_ref = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="<i2")
    a_ref = np.frombuffer(audioop.alaw2lin(all_bytes, 2), dtype="<i2")
    assert (mulaw_decode(all_bytes) == mu_ref).all()
    assert (alaw_decode(all_bytes) == a_ref).all()


def test_g711_container_roundtrip():
    from ocr_spark.kernels.wav import (
        alaw_decode,
        decode_wav,
        encode_g711_wav,
        mulaw_decode,
        parse_wav_header,
    )

    coded = bytes((np.arange(37) * 7 % 256).astype(np.uint8))
    for law, dec_fn in (("mu", mulaw_decode), ("a", alaw_decode)):
        data = encode_g711_wav(coded, law=law, rate=8000)
        assert parse_wav_header(data) == (8000, 1, 8, 37)
        got, rate = decode_wav(data)
        assert rate == 8000
        assert (got.ravel() == dec_fn(coded)).all()


def test_ima_adpcm_roundtrip_tracks_signal():
    from ocr_spark.kernels.wav import decode_wav, encode_ima_wav, parse_wav_header

    t = np.arange(0, 2000)
    sig = (3000 * np.sin(t / 20) + 500 * np.sin(t / 3)).astype(np.int16)
    data = encode_ima_wav(sig, rate=8000, frames_per_block=505)
    assert parse_wav_header(data) == (8000, 1, 4, 2000)
    dec, _ = decode_wav(data)
    err = np.abs(dec.ravel().astype(np.int32) - sig.astype(np.int32))
    # ADPCM is lossy; the state machine must track within ~1 step
    assert len(dec) == len(sig)
    assert err.max() < 2000 and err.mean() < 200


def test_ima_adpcm_block_state_machine_pinned():
    # hand-stepped spec vector: header predictor 100 index 0 (step 7),
    # nibbles 0x1 (delta +1: 7>>3 + 7>>2 = 0+1... diff=7>>3=0, +7>>2=1)
    # low nibble first within each byte
    from ocr_spark.kernels.wav import ima_adpcm_decode_block

    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x81, 0x13])
    out = ima_adpcm_decode_block(block, 5)
    # step stays 7 throughout (nibs 1/8/3 all map to index delta -1,
    # clamped at 0):
    # nib 0x1: diff = step>>3 + step>>2 = 0 + 1 -> pred 101
    # nib 0x8: sign-only, diff = step>>3 = 0    -> pred 101
    # nib 0x3: diff = 0 + 1 + 3 (bits 0,1)      -> pred 105
    # nib 0x1: diff = 1                          -> pred 106
    assert out.tolist() == [100, 101, 101, 105, 106]


def test_ima_adpcm_rejects_bad_blocks():
    from ocr_spark.kernels.wav import ima_adpcm_decode_block

    with pytest.raises(ValueError):
        ima_adpcm_decode_block(b"\x00\x00", 4)  # short header
    with pytest.raises(ValueError):
        ima_adpcm_decode_block(struct.pack("<hBB", 0, 99, 0), 1)  # index


def test_unknown_wav_codec_still_rejected():
    from ocr_spark.kernels.wav import parse_wav_header

    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)  # MS ADPCM
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + (4).to_bytes(4, "little") + b"\x00" * 4
    data = b"RIFF" + len(chunks).to_bytes(4, "little") + chunks
    with pytest.raises(NotImplementedError):
        parse_wav_header(data)
