"""Dependency-free WAV (RIFF PCM) codec — closes the AUDIO leg of the
multimodal decode boundary the way functions/png.py closed images and
the MPNG container closed video.

Public-knowledge implementation of the canonical RIFF/WAVE layout
(Microsoft/IBM WAVE spec): 'RIFF' + size + 'WAVE', an 'fmt ' chunk
(PCM, mono/stereo, 16-bit) and a 'data' chunk of little-endian int16
samples.  Chunk-walks on decode, so extra chunks (LIST/INFO) are
skipped spec-conformantly.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def is_wav(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 12 and data[:4] == WAV_MAGIC and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int, info: bytes | None = None) -> bytes:
    """Mono 16-bit PCM WAV from an int16 sample array.  ``info`` inserts
    a LIST/INFO metadata chunk between fmt and data (word-aligned, spec
    layout) — the byte stream changes while the decoded samples do not,
    which is exactly the re-encoded-copy case the m10 sample-level dedup
    must catch and a byte-level content hash cannot."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n_channels, bits = 1, 16
    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate, block_align, bits
    )
    extra = b""
    if info is not None:
        payload = b"INFO" + info
        extra = struct.pack("<4sI", b"LIST", len(payload)) + payload
        if len(payload) & 1:
            extra += b"\x00"  # chunks are word-aligned
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = b"WAVE" + fmt + extra + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 sample array).  Walks chunks, so
    writers that insert LIST/INFO chunks between fmt and data still
    decode; raises ValueError on non-PCM or non-16-bit payloads."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE signature")
    off = 12
    rate, bits, fmt_code = None, None, None
    samples = None
    while off + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, off)
        off += 8
        if cid == b"fmt ":
            fmt_code, _ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", data, off)
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=off)
        off += size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    if fmt_code != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={fmt_code}, bits={bits})")
    return int(rate), samples
