"""GIF codec (ocr_spark.kernels.gif): LZW, container, interlace."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.kernels.gif import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

PAL8 = np.array([[i * 32, 255 - i * 32, i * 16] for i in range(8)], np.uint8)


@pytest.mark.parametrize(
    "shape,ncol",
    [((1, 1), 2), ((3, 5), 4), ((64, 64), 16), ((200, 300), 8)],
)
def test_lzw_roundtrip_exact(shape, ncol):
    # the 200x300 noisy case grows the code table past 4095 entries,
    # covering the 12-bit cap + mid-stream CLEAR reset on both sides
    rng = np.random.RandomState(7)
    idx = rng.randint(0, ncol, size=shape).astype(np.uint8)
    mcs = max(2, (ncol - 1).bit_length())
    dec = _lzw_decode(_lzw_encode(idx, mcs), mcs, idx.size).reshape(shape)
    assert (dec == idx).all()


def test_lzw_truncation_raises():
    idx = np.arange(64, dtype=np.uint8).reshape(8, 8) % 4
    enc = _lzw_encode(idx, 2)
    with pytest.raises(GifError):
        _lzw_decode(enc[: len(enc) // 2], 2, idx.size)


def test_single_frame_roundtrip_and_meta():
    img = (np.add.outer(np.arange(17) * 3, np.arange(26)) % 8).astype(
        np.uint8
    )
    d = decode_gif(encode_gif(img, PAL8))
    assert (d.version, d.width, d.height, d.n_frames) == ("89a", 26, 17, 1)
    assert len(d.palette) == 8
    assert (d.palette[:8] == PAL8).all()
    assert (d.frames[0] == img).all()


def test_multiframe_with_interlaced_first_frame():
    base = (np.add.outer(np.arange(13) * 3, np.arange(11)) % 8).astype(
        np.uint8
    )
    frames = [((base + 7 * k) % 8).astype(np.uint8) for k in range(3)]
    d = decode_gif(encode_gif(frames, PAL8, interlace_first=True))
    assert d.n_frames == 3
    for k in range(3):
        assert (d.frames[k] == frames[k]).all()


def test_interlace_actually_permutes_the_stream():
    # rows are distinct constants: the interlaced file must DIFFER on
    # the wire yet decode identically — proves the de-interlace is
    # real, not a no-op
    img = np.repeat(
        np.arange(8, dtype=np.uint8).reshape(8, 1) % 8, 5, axis=1
    )
    plain = encode_gif(img, PAL8, interlace_first=False)
    inter = encode_gif(img, PAL8, interlace_first=True)
    assert plain != inter
    assert (decode_gif(plain).frames[0] == img).all()
    assert (decode_gif(inter).frames[0] == img).all()


def test_reject_garbage_and_truncation():
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF_______")
    img = (np.zeros((4, 4))).astype(np.uint8)
    good = encode_gif(img, PAL8)
    with pytest.raises(GifError):
        decode_gif(good[:-6])  # cuts into the LZW sub-blocks


def test_index_exceeding_palette_rejected_on_encode():
    with pytest.raises(GifError):
        _lzw_encode(np.array([[9]], dtype=np.uint8), 3)
