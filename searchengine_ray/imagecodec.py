"""Pure-numpy Netpbm image codec (P5 grayscale / P6 RGB, maxval ≤ 255).

The container ships no image libraries, but Netpbm's binary formats are a
trivial header + raw bytes — so the engine's image decode step can be REAL
for this family instead of a stub: ``multimodal.decode_image`` routes
P5/P6 payloads here and reserves ``NotImplementedError`` for genuinely
codec-bound formats (JPEG/PNG magic bytes).

Header grammar (Netpbm spec): magic, then whitespace-separated width,
height, maxval, where ``#`` starts a comment running to end-of-line and
any single whitespace byte terminates the header before the raster.
"""

from __future__ import annotations

import numpy as np

_MAGIC_CHANNELS = {b"P5": 1, b"P6": 3}


def encode_netpbm(arr: np.ndarray) -> bytes:
    """uint8 array (H, W) → P5 or (H, W, 3) → P6."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + b"\n%d %d\n255\n" % (w, h) + a.tobytes()


def _read_header_token(buf: bytes, pos: int) -> tuple[int, int]:
    """Next ASCII integer token at/after ``pos``, skipping whitespace and
    ``#`` comments. Returns (value, position after the token)."""
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in b"#":
            while pos < n and buf[pos] not in b"\r\n":
                pos += 1
        elif c in b" \t\r\n\x0b\x0c":
            pos += 1
        else:
            break
    start = pos
    while pos < n and buf[pos] in b"0123456789":
        pos += 1
    if start == pos:
        raise ValueError("netpbm: malformed header (expected integer)")
    return int(buf[start:pos]), pos


def decode_netpbm(payload: bytes) -> np.ndarray:
    """P5 → uint8 (H, W); P6 → uint8 (H, W, 3). Raises ValueError on a
    non-netpbm or malformed payload."""
    magic = payload[:2]
    channels = _MAGIC_CHANNELS.get(magic)
    if channels is None:
        raise ValueError(f"not a binary netpbm payload (magic {magic!r})")
    w, pos = _read_header_token(payload, 2)
    h, pos = _read_header_token(payload, pos)
    maxval, pos = _read_header_token(payload, pos)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"netpbm: unsupported maxval {maxval}")
    if pos >= len(payload) or payload[pos] not in b" \t\r\n\x0b\x0c":
        raise ValueError("netpbm: missing whitespace before raster")
    pos += 1  # the single whitespace byte separating header from raster
    need = w * h * channels
    raster = payload[pos:pos + need]
    if len(raster) != need:
        raise ValueError(
            f"netpbm: truncated raster ({len(raster)} of {need} bytes)")
    a = np.frombuffer(raster, dtype=np.uint8)
    return a.reshape(h, w) if channels == 1 else a.reshape(h, w, 3)
