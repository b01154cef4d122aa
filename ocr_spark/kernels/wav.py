"""Pure-stdlib PCM WAV (RIFF/WAVE) codec — the REAL audio decode path.

Audio rides the multimodal binary columns the same way images do
(SURVEY.md §1.4); this module gives the audio branch an actual container
parse instead of a stub: classic RIFF chunk walk, fmt/data extraction,
16-bit/8-bit PCM to NumPy, plus a deterministic writer for fixtures. A
compressed-codec decode (MP3/AAC) stays the ffmpeg plug-in seam — PCM
WAV is the interchange format a 100-TB training pipeline normalizes
into anyway.
"""

from __future__ import annotations

import struct

import numpy as np


def _walk_wav(data: bytes) -> tuple[int, int, int, int, int]:
    """ONE RIFF chunk walk → (rate, channels, bits, data_off, data_len),
    using the FIRST data chunk — shared by the header scan and the
    decoder so metadata and samples can never disagree."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data_loc = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and fmt is None:
            audio_fmt, ch, rate = struct.unpack("<HHI", data[pos + 8 : pos + 16])
            bits = int.from_bytes(data[pos + 22 : pos + 24], "little")
            if audio_fmt != 1:
                raise NotImplementedError(f"WAV codec {audio_fmt} (non-PCM)")
            fmt = (rate, ch, bits)
        elif cid == b"data" and data_loc is None:
            data_loc = (pos + 8, ln)
        # chunks are word-aligned: odd sizes pad one byte
        pos += 8 + ln + (ln & 1)
    if fmt is None or data_loc is None:
        raise ValueError("WAV missing fmt/data chunk")
    rate, ch, bits = fmt
    if bits not in (8, 16):
        raise NotImplementedError(f"WAV {bits}-bit PCM unsupported")
    return rate, ch, bits, data_loc[0], data_loc[1]


def parse_wav_header(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_frames) from the RIFF
    chunk walk — no sample materialization (a metadata scan over a large
    corpus must never pay for sample decode)."""
    rate, ch, bits, _off, data_len = _walk_wav(data)
    return rate, ch, bits, data_len // (ch * bits // 8)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, channels) int16 samples, sample_rate).
    8-bit PCM (unsigned) is centered and widened to int16."""
    rate, ch, bits, off, ln = _walk_wav(data)
    body = data[off : off + ln]
    if bits == 16:
        samples = np.frombuffer(body, dtype="<i2")
    else:  # 8-bit PCM is unsigned, midpoint 128
        samples = (np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 128) << 8
    return samples.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n[, channels]) int16 → PCM16 RIFF/WAVE bytes (deterministic)."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    body = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(body).to_bytes(4, "little") + body
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks
