"""Pure-numpy WAV (RIFF PCM) codec — 16-bit integer PCM, mono or
multi-channel.

The audio sibling of :mod:`searchengine_ray.imagecodec`: RIFF/WAVE is a
chunked container whose PCM payload is raw little-endian samples, so the
engine's audio decode step can be REAL without any codec library.
``multimodal``'s audio path routes RIFF payloads here; compressed audio
(non-PCM format tags, non-RIFF magic) raises ``NotImplementedError``
upstream.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 array (n,) mono or (n, ch) → RIFF/WAVE PCM bytes."""
    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (samples int16 (n, ch), sample_rate). Raises
    ValueError on non-RIFF, non-PCM or malformed payloads."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt_info = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) != clen:  # declared length past end-of-buffer
            raise ValueError(
                f"wav: truncated {cid!r} chunk ({len(body)} of {clen} bytes)")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: short fmt chunk")
            tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or bits != 16:
                raise ValueError(
                    f"wav: only 16-bit PCM supported (tag {tag}, bits {bits})")
            fmt_info = (ch, rate)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("wav: missing fmt or data chunk")
    ch, rate = fmt_info
    if len(data) % (2 * ch):
        raise ValueError("wav: truncated sample data")
    a = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return a, rate
