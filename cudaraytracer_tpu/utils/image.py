"""PNG output — replaces stb_image_write (render.h:5-6, WritePng render.h:135-157).

Pure-Python encoder on stdlib zlib; no third-party image dependency.  Parity
notes with the reference WritePng:
  * colorBuffer row 0 is the BOTTOM scanline; the writer flips rows so the PNG
    has row 0 on top (render.h:139-141).
  * byte = char(255.99 * c) (render.h:142-144).
  * output is RGBA with alpha 255 (RGBColor, render.h:32-38); ``write_png``
    matches that by default.
  * default path layout images/<tag>/picture_<frame>.png (render.h:148-153).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def to_rgba_bytes(color_buffer: np.ndarray, flip: bool = True) -> np.ndarray:
    """f32[H,W,3] in [0,1] (row 0 = bottom) -> uint8[H,W,4] (row 0 = top)."""
    arr = np.asarray(color_buffer, np.float32)
    rgb = (255.99 * arr).astype(np.uint8)      # render.h:142-144
    if flip:
        rgb = rgb[::-1]
    alpha = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([rgb, alpha], axis=-1)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8[H,W,3|4] -> PNG bytes (8-bit, RGB/RGBA, filter 0)."""
    pixels = np.asarray(pixels, np.uint8)
    h, w, c = pixels.shape
    color_type = {3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8),
                          pixels.reshape(h, w * c)], axis=1).tobytes()
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def write_png(path: str, color_buffer: np.ndarray, flip: bool = True,
              rgba: bool = True) -> None:
    """WritePng parity: float color buffer -> PNG file (dirs auto-created)."""
    pix = to_rgba_bytes(color_buffer, flip)
    if not rgba:
        pix = pix[..., :3]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(encode_png(pix))


def frame_path(frame_index: int, folder: str = "images/moveTest") -> str:
    """render.h:148-153 — images/moveTest/picture_<frame>.png."""
    return os.path.join(folder, f"picture_{frame_index}.png")


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader for round-tripping our own files in tests
    (8-bit RGB/RGBA, no interlace)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = c = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type = struct.unpack(">IIBB", body[:10])
            assert depth == 8
            c = {2: 3, 6: 4}[color_type]
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * c + 1)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].reshape(h, w, c)
