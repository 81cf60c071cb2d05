"""PNG codec tests: the general reader (filters 0-4, palette, greyscale,
16-bit) against hand-filtered files — i.e. PNGs our own writer would never
produce, emulating external tools (stb_image parity, texture.h:54-76)."""

import struct
import zlib

import numpy as np
import pytest

from cudaraytracer_tpu.utils.image import encode_png, read_png, write_png


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _png(w, h, depth, color_type, raw, plte=None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _filter_rows(pix: np.ndarray, bpp: int, ftype_of_row) -> bytes:
    """Forward-apply PNG filters so the reader has to reverse them."""
    h, stride = pix.shape
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = ftype_of_row(y)
        cur = pix[y].astype(np.int32)
        enc = cur.copy()
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgb_each_filter(tmp_path, ftype):
    rng = np.random.default_rng(ftype)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    raw = _filter_rows(img.reshape(13, 17 * 3), 3, lambda y: ftype)
    p = tmp_path / f"f{ftype}.png"
    p.write_bytes(_png(17, 13, 8, 2, raw))
    np.testing.assert_array_equal(read_png(str(p)), img)


def test_mixed_filters_rgba(tmp_path):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 11, 4), dtype=np.uint8)
    raw = _filter_rows(img.reshape(16, 11 * 4), 4, lambda y: y % 5)
    p = tmp_path / "mixed.png"
    p.write_bytes(_png(11, 16, 8, 6, raw))
    np.testing.assert_array_equal(read_png(str(p)), img)


def test_greyscale_and_palette(tmp_path):
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = _filter_rows(g, 1, lambda y: 2)
    p = tmp_path / "grey.png"
    p.write_bytes(_png(8, 8, 8, 0, raw))
    out = read_png(str(p))
    np.testing.assert_array_equal(out, np.repeat(g[..., None], 3, axis=-1))

    # 16-entry palette, Paeth-filtered indices
    pal = np.arange(48, dtype=np.uint8)
    idx = (np.arange(64, dtype=np.uint8) % 16).reshape(8, 8)
    raw = _filter_rows(idx, 1, lambda y: 4)
    p2 = tmp_path / "pal.png"
    p2.write_bytes(_png(8, 8, 8, 3, raw, plte=pal.tobytes()))
    np.testing.assert_array_equal(read_png(str(p2)),
                                  pal.reshape(16, 3)[idx])


def test_16bit_downsamples_like_stb(tmp_path):
    rng = np.random.default_rng(1)
    img16 = rng.integers(0, 65536, (6, 7, 3), dtype=np.uint16)
    raw16 = img16.byteswap().tobytes() if img16.dtype.byteorder == "<" else \
        img16.astype(">u2").tobytes()
    raw16 = img16.astype(">u2").tobytes()
    rows = np.frombuffer(raw16, np.uint8).reshape(6, 7 * 6)
    raw = _filter_rows(rows, 6, lambda y: 0)
    p = tmp_path / "deep.png"
    p.write_bytes(_png(7, 6, 16, 2, raw))
    np.testing.assert_array_equal(read_png(str(p)),
                                  (img16 >> 8).astype(np.uint8))


def test_writer_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.random((9, 14, 3)).astype(np.float32)
    p = tmp_path / "rt.png"
    write_png(str(p), img, flip=False)
    out = read_png(str(p))
    np.testing.assert_array_equal(out[..., :3], (255.99 * img).astype(np.uint8))


def test_image_texture_from_filtered_png(tmp_path):
    """ImageTexture loads an 'external' (Paeth-filtered) PNG and renders
    (texture.h:54-76 parity path)."""
    import jax
    import jax.numpy as jnp
    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.core.rays import make_rays
    from cudaraytracer_tpu.models.scene import SceneBuilder
    from cudaraytracer_tpu.ops import intersect as isect
    from cudaraytracer_tpu.models import materials as mats
    from cudaraytracer_tpu.models import textures as texs

    tex_img = np.zeros((8, 8, 3), np.uint8)
    tex_img[:, :4] = (255, 0, 0)
    tex_img[:, 4:] = (0, 0, 255)
    raw = _filter_rows(tex_img.reshape(8, 24), 3, lambda y: 4)
    p = tmp_path / "tex.png"
    p.write_bytes(_png(8, 8, 8, 2, raw))

    b = SceneBuilder()
    tid = b.materials.textures.image_from_png(str(p))
    mat = b.materials.lambertian(tex_id=tid)
    b.add_sphere((0, 0, -3), 1.0, mat)
    scene = b.build()
    rays = make_rays(jnp.zeros((1, 3), jnp.float32),
                     jnp.asarray([[0, 0, -1.0]], jnp.float32))
    hits = isect.intersect_scene(scene, rays)
    assert bool(hits.hit[0])
    val = mats.scatter(scene.materials, scene.textures, hits.mat, rays,
                       hits.p, hits.normal, hits.u, hits.v,
                       jax.random.key(0)).attenuation
    v = np.asarray(val[0])
    # the attenuation must be one of the two texel colors
    is_red = np.allclose(v, [1.0, 0.0, 0.0])
    is_blue = np.allclose(v, [0.0, 0.0, 1.0])
    assert is_red or is_blue, v


def _png_interlaced(w, h, color_type, raw) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


@pytest.mark.parametrize("shape,ftype", [((8, 8), 0), ((9, 5), 4),
                                         ((3, 2), 1), ((16, 13), 3)])
def test_adam7_interlaced_rgb(tmp_path, shape, ftype):
    """Adam7: seven independently-filtered sub-images scattered onto the
    pixel grid — odd sizes exercise empty/truncated passes."""
    h, w = shape
    rng = np.random.default_rng(h * 31 + w)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        raw += _filter_rows(sub.reshape(ph, pw * 3), 3, lambda y: ftype)
    p = tmp_path / f"adam7_{h}x{w}.png"
    p.write_bytes(_png_interlaced(w, h, 2, bytes(raw)))
    np.testing.assert_array_equal(read_png(str(p)), img)
