"""Decide the ROUND5_NOTES §12.3 backlog item by DATA, before building it:
would per-(step, chunk) skip flags in _deferred_texture_radiance beat the
round-5 per-chunk dead-chunk skip?

The round-5 skip takes the cheap sum(em + other) branch for chunks where NO
lane ever hit.  Records also die WITHIN hit chunks (alive decay
[100, 83, 32, 16, 8, 5, 3, 2, 2]% — ROUND4_NOTES §11): a (step, chunk) cell
with no hit record is exactly cheap too (every lane gathers the miss row, so
f = g = 1 at that step and the cumprod carry is unchanged).  A per-step cond
variant would cost 9 conds + 9 per-step gathers per chunk (vs ONE batched
(steps, c)-index gather today — gather_micro.py: per-op overhead made 20
split gathers 18.7x slower than one batched gather at the same index count).

This script measures the actual skippable fraction on the bench tex workload
(image-textured bunny 1280x720x8 path-8 fixed): per-(step, chunk) hit-flag
matrix at the production CH=2^15.  If hit chunks keep hit records at nearly
every step (the expectation: surviving lanes cluster in object bands), the
per-step variant's upper bound is ~0 and it stays un-built.  Run SOLO.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.core.camera import generate_pixel_rays
from cudaraytracer_tpu.ops.render import _swizzled_pixels
from bench import _tex_scene, _mega_tables

W, H, SPP, DEPTH = 1280, 720, 8, 8
STEPS = DEPTH + 1
scene, cam = _tex_scene(W / H)
tables = _mega_tables(scene)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=DEPTH,
                       integrator="path", engine="mega", ray_chunk=1 << 17,
                       quirks=crt.Quirks.fixed())
pix = _swizzled_pixels(W, H)
rays = generate_pixel_rays(cam, W, H, SPP, jax.random.key(0), pix)
n = rays.origin.shape[0]
print(f"{scene.n_triangles} tris, {n} rays", flush=True)

flat = jax.jit(lambda s, tb: mk._mega_tex_planes(
    s, rays, jax.random.key(3), cfg, tb, None, padded=True))(scene, tables)
w = np.asarray(flat[3:3 + 10 * STEPS].reshape(STEPS, 10, -1)[:, 0, :])  # winner ids

CH = mk._TEX_CHUNK
npad = w.shape[1]
k = npad // CH
hit = (w[:, : k * CH].reshape(STEPS, k, CH) >= 0.0).any(axis=2)  # (STEPS, k)
chunk_hit = hit.any(axis=0)                                       # (k,)
print(f"CH=2^{CH.bit_length()-1}: {k} chunks, hit chunks "
      f"{chunk_hit.sum()}/{k} ({chunk_hit.mean():.1%})", flush=True)
cells = hit[:, chunk_hit]  # expensive cells under the per-chunk skip
print("per-step any-hit rate WITHIN hit chunks (step 0..8):",
      np.array2string(cells.mean(axis=1), precision=3), flush=True)
skippable = 1.0 - cells.mean()
print(f"per-(step,chunk) skippable fraction of today's expensive cells: "
      f"{skippable:.1%}", flush=True)
# Upper bound on the win: reconstruction is ~(skippable) cheaper at best,
# BEFORE paying 9x per-step gather op overhead and 9x cond dispatch.
for ch_log in (13, 14):
    kk = npad // (1 << ch_log)
    h2 = (w[:, : kk << ch_log].reshape(STEPS, kk, 1 << ch_log) >= 0.0).any(2)
    c2 = h2[:, h2.any(axis=0)]
    print(f"  (context CH=2^{ch_log}: skippable {1.0 - c2.mean():.1%})",
          flush=True)

# ---------------------------------------------------------------------------
# Per-(step, chunk) skip PROTOTYPE: scan over steps inside each chunk, with a
# lax.cond per step (cheap identity when the cell has no hit).  NOT shipped —
# this measures whether the 48.9% skippable cells beat the cost of splitting
# the batched (steps, c)-index gather into per-step gathers + 9x cond
# dispatch.  fp caveat: the sequential acc differs from the batched
# sum-over-steps by reassociation only (reported as max-abs diff).
# ---------------------------------------------------------------------------
import time
from cudaraytracer_tpu.ops.megakernel import (
    _assemble_tex_info, _tex_uv, TI_CLS, TI_FLAM, TI_FLIT, TI_IMG, TI_W,
    TI_H, TI_A00)

quirks = cfg.quirks


def recon_per_step(scene, tables, flat, ch):
    n_l = flat.shape[1]
    info = _assemble_tex_info(scene, tables)
    miss_row = info.shape[0] - 1
    planes = flat[3:3 + 10 * STEPS].reshape(STEPS, 10, n_l)
    kk = -(-n_l // ch)
    pad = kk * ch - n_l
    padded = (planes if not pad else jnp.concatenate(
        [planes, jnp.zeros((STEPS, 10, pad), jnp.float32)], axis=-1))
    chunked = jnp.moveaxis(padded.reshape(STEPS, 10, kk, ch), 2, 0)
    step_hit = jnp.any(chunked[:, :, 0, :] >= 0.0, axis=-1)     # (kk, STEPS)

    def chunk_body(args):
        pl_c, flags = args                  # (STEPS,10,ch), (STEPS,)

        def all_cheap(_):
            em = jnp.swapaxes(pl_c[:, 1:4], 0, 1)
            other = jnp.swapaxes(pl_c[:, 4:7], 0, 1)
            return jnp.sum(em + other, axis=1)          # (3, ch)

        def scanned(_):
            def step_fn(carry, xs):
                acc, F = carry
                pl_s, flag = xs             # (10, ch), scalar
                em, other = pl_s[1:4], pl_s[4:7]

                def cheap(op):
                    a, Fc = op
                    return a + Fc * (em + other), Fc

                def expensive(op):
                    a, Fc = op
                    w = pl_s[0].astype(jnp.int32)
                    row = info[jnp.where(w < 0, miss_row, w)]   # (ch, TI)
                    rowT = jnp.transpose(row)[:, None, :]       # (TI,1,ch)
                    u, v = _tex_uv(rowT, pl_s[7:10][None])      # (1, ch)
                    nx, ny = rowT[TI_W], rowT[TI_H]
                    i = jnp.clip((u * nx).astype(jnp.int32), 0,
                                 jnp.maximum(nx.astype(jnp.int32) - 1, 0))
                    j = jnp.clip(((1.0 - v) * ny - 0.001).astype(jnp.int32),
                                 0, jnp.maximum(ny.astype(jnp.int32) - 1, 0))
                    texel = jnp.transpose(scene.textures.images[
                        rowT[TI_IMG].astype(jnp.int32), j, i],
                        (2, 0, 1)).astype(jnp.float32) / 255.0  # (3,1,ch)
                    att = (rowT[TI_A00:TI_A00 + 3]
                           if quirks.lambertian_zero_uv else texel)
                    f_flag = rowT[TI_FLAM]      # att_includes_light=False (path)
                    f = jnp.where(f_flag > 0.0, att, 1.0)[:, 0]
                    g = jnp.where(rowT[TI_FLIT] > 0.0, texel, 1.0)[:, 0]
                    return a + Fc * (em * g + other), Fc * f

                return jax.lax.cond(flag, expensive, cheap, (acc, F)), None

            init = (jnp.zeros((3, ch), jnp.float32),
                    jnp.ones((3, ch), jnp.float32))
            (acc, _), _ = jax.lax.scan(step_fn, init, (pl_c, flags))
            return acc

        return jax.lax.cond(jnp.any(flags), scanned, all_cheap, 0)

    out = jax.lax.map(chunk_body, (chunked, step_hit))
    return jnp.moveaxis(out, 0, 1).reshape(3, kk * ch)[:, :n_l]


def timeit(fn, *a, iters=3):
    float(jnp.sum(fn(*a)))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


prod = jax.jit(lambda s, tb, f: mk._deferred_texture_radiance(
    s, tb, f, STEPS, cfg.quirks, compact=True))
t_prod = timeit(prod, scene, tables, flat)
ref = prod(scene, tables, flat)
print(f"production (per-chunk skip, CH=2^15): {t_prod:.3f}s", flush=True)
for ch_log in (15, 14, 13):
    fn = jax.jit(lambda s, tb, f, c=1 << ch_log: recon_per_step(s, tb, f, c))
    t = timeit(fn, scene, tables, flat)
    d = float(jnp.max(jnp.abs(fn(scene, tables, flat) - ref)))
    print(f"per-step skip CH=2^{ch_log}: {t:.3f}s  max|diff|={d:.2e}",
          flush=True)
