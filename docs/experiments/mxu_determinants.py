"""MXU vs VPU for ray-triangle determinant sweeps — the measurement closing
ROUND2_NOTES "MXU ray-triangle determinants: designed, blocked on layout".

The design question: all four Moller-Trumbore quantities (a, t, u, v
numerators) are bilinear in 10 per-ray features vs per-triangle constants,
so ONE (rays x 10) @ (10 x 4T) matmul could move the sweep's dominant FLOPs
from the VPU to the MXU.  The blocker was layout: ray state lives in
(32, 128) tiles and Mosaic has no free (R, L) -> (R*L) relayout.  Two
escape hatches remained unmeasured:

  B. per-sublane-row matmuls — for each of the 32 sublane rows r, gather
     Phi_r (10, 128) by dynamic-sublane slicing (legal) and run
     C (4T, 10) @ Phi_r (10, 128) on the MXU: k=10 contraction, no relayout.
  C. a full dual-layout kernel — pay explicit (32, 128) <-> transposed
     relayouts for the ~10 feature planes + ~13 state planes per bounce and
     run ONE big matmul.  Variant C here measures the RELAYOUT TRAFFIC ALONE
     (transposes, zero math): if that floor already rivals the VPU sweep,
     the whole family is dead regardless of matmul rate.

Variant A is the control: the megakernel's actual chunk math (full
Moller-Trumbore incl. valid tests and the running min) on the VPU.

Analytic expectation (v5e, 940 MHz): a (1024, 10) @ (10, 128) matmul
streams m=1024 rows through the 128x128 array once the k=10 weights are
loaded — ~(1024 + fill) cycles ~ 1.2 us; x32 rows ~ 40 us per
(tile, 256-tri super).  The VPU control does 256 x 4096 ~ 1.05 M pair tests
at the measured 42 Gpairs/s ~ 25 us.  k=10 starves the MXU (it computes
128-deep dot products; 118/128 of the array depth idles), so the matmul
variant should LOSE even before its epilogue.  This script checks that
arithmetic on hardware.

Run:  python docs/experiments/mxu_determinants.py            (TPU)
      python docs/experiments/mxu_determinants.py --interpret (CPU smoke)

Measured results live in ROUND2_NOTES.md ("MXU ray-triangle determinants").
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROWS, LANES = 32, 128
T = 256            # triangles per iteration (one megakernel super)
N_FEAT = 10        # [d, o, d x o, 1]


def _vpu_kernel(tri_ref, o_ref, d_ref, out_ref, *, iters: int):
    """Variant A: the megakernel's chunk math (8-prim chunks, full MT)."""
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    o3 = (ox[None], oy[None], oz[None])
    d3 = (dx[None], dy[None], dz[None])

    def comp(base, k):
        return tri_ref[pl.ds(base, 8), k:k + 1][:, :, None]

    def chunk(c, best):
        base = c * 8
        v0x, v0y, v0z = comp(base, 0), comp(base, 1), comp(base, 2)
        e1x, e1y, e1z = comp(base, 3), comp(base, 4), comp(base, 5)
        e2x, e2y, e2z = comp(base, 6), comp(base, 7), comp(base, 8)
        hx = d3[1] * e2z - d3[2] * e2y
        hy = d3[2] * e2x - d3[0] * e2z
        hz = d3[0] * e2y - d3[1] * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a
        sx = o3[0] - v0x
        sy = o3[1] - v0y
        sz = o3[2] - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (d3[0] * qx + d3[1] * qy + d3[2] * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        valid = (jnp.abs(a) >= 1e-6) & (u >= 0.0) & (u <= 1.0) \
            & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-3)
        t3 = jnp.where(valid, t, 3.0e38)
        return jnp.minimum(best, jnp.min(t3, axis=0))

    def it(i, best):
        return jax.lax.fori_loop(0, T // 8, chunk, best)

    best = jnp.full((ROWS, LANES), 3.0e38, jnp.float32)
    out_ref[...] = jax.lax.fori_loop(0, iters, it, best)


def _mxu_kernel(coef_ref, feat_ref, out_ref, *, iters: int, k_dim: int):
    """Variant B: per-sublane-row C (4T, k) @ Phi_r (k, 128) on the MXU.

    feat_ref is (N_FEAT * ROWS, LANES): feature f's plane occupies rows
    [f*ROWS, (f+1)*ROWS).  Phi_r gathers one dynamic sublane slice per
    feature (static feature offset + dynamic row — Mosaic-legal)."""

    def row(r, best):
        phi = jnp.concatenate(
            [feat_ref[pl.ds(f * ROWS + r, 1), :] for f in range(k_dim)],
            axis=0)                                       # (k, 128)
        prod = jnp.dot(coef_ref[:, :k_dim], phi,
                       preferred_element_type=jnp.float32)  # (4T, 128)
        # minimal epilogue: fold the 4 quantities-per-tri axis + tri axis
        tmin = jnp.min(prod, axis=0, keepdims=True)        # (1, 128)
        out_ref[pl.ds(r, 1), :] = jnp.minimum(best_row(best, r), tmin)
        return best

    def best_row(best, r):
        return out_ref[pl.ds(r, 1), :]

    def it(i, carry):
        return jax.lax.fori_loop(0, ROWS, row, carry)

    out_ref[...] = jnp.full((ROWS, LANES), 3.0e38, jnp.float32)
    jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))


def _mxu_full_kernel(coef_ref, feat_ref, out_ref, *, iters: int):
    """Variant B2: the PRODUCTION epilogue on the matmul outputs — what a
    megakernel chunk_math_mxu would actually run per sublane row:

      prod (4T, 128) = Coef (4T, 10) @ Phi_r (10, 128)
      rows [0:T) = a, [T:2T) = t_num, [2T:3T) = u_num, [3T:4T) = v_num
      sign-aware Moller-Trumbore validity on NUMERATORS (no division until
      the candidate t), t = t_num * (1/a), min-merge into best_t.

    Semantics follow Quirks.fixed() (t window, no backface test)."""

    def row(r, carry):
        phi = jnp.concatenate(
            [feat_ref[pl.ds(f * ROWS + r, 1), :] for f in range(N_FEAT)],
            axis=0)                                        # (10, 128)
        prod = jnp.dot(coef_ref[:, :N_FEAT], phi,
                       preferred_element_type=jnp.float32)  # (4T, 128)
        a = prod[0:T]
        tn = prod[T:2 * T]
        un = prod[2 * T:3 * T]
        vn = prod[3 * T:4 * T]
        a2 = a * a
        ua = un * a
        va = vn * a
        ta = tn * a
        valid = (jnp.abs(a) >= 1e-6) & (ua >= 0.0) & (ua <= a2) \
            & (va >= 0.0) & (ua + va <= a2) & (ta > 1e-3 * a2)
        t3 = jnp.where(valid, tn * (1.0 / a), 3.0e38)      # (T, 128)
        tmin = jnp.min(t3, axis=0, keepdims=True)          # (1, 128)
        out_ref[pl.ds(r, 1), :] = jnp.minimum(out_ref[pl.ds(r, 1), :], tmin)
        return carry

    def it(i, carry):
        return jax.lax.fori_loop(0, ROWS, row, carry)

    out_ref[...] = jnp.full((ROWS, LANES), 3.0e38, jnp.float32)
    jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))


def _relayout_kernel(planes_ref, out_ref, *, iters: int, n_planes: int):
    """Variant C: the dual-layout kernel's relayout floor — transpose
    n_planes (32, 128) planes to (128, 32) and back, NO math.  Both
    directions feed sliced accumulators so neither transpose dead-codes."""

    def it(i, carry):
        a1, a2 = carry
        for p in range(n_planes):
            fwd = planes_ref[p * ROWS:(p + 1) * ROWS, :].T    # (128, 32)
            back = fwd.T                                       # (32, 128)
            a1 = a1 + back[0:8, :]
            a2 = a2 + fwd[0:8, :]
        return a1, a2

    a1 = jnp.zeros((8, LANES), jnp.float32)
    a2 = jnp.zeros((8, ROWS), jnp.float32)
    a1, a2 = jax.lax.fori_loop(0, iters, it, (a1, a2))
    out_ref[...] = (jnp.full((ROWS, LANES), 0.0, jnp.float32)
                    + jnp.min(a1) + jnp.min(a2))


def _time(fn, *args) -> float:
    # warm up BOTH the kernel and the scalar-fetch reduce (each compiles
    # through the remote tunnel, 10-150 s — a cold jnp.sum inside the timed
    # region once inflated a measurement ~600x); fetching the float forces
    # full execution (block_until_ready returns early on this backend)
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    float(jnp.sum(fn(*args)))
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--tiles", type=int, default=256)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        args.tiles, args.iters = 2, 2

    global pl
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    tiles, iters = args.tiles, args.iters
    pairs = float(tiles) * iters * T * ROWS * LANES

    tri = jnp.asarray(rng.normal(size=(T, LANES)).astype(np.float32))
    o = jnp.asarray(rng.normal(size=(3, tiles * ROWS, LANES)
                               ).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(3, tiles * ROWS, LANES)
                               ).astype(np.float32))
    coef = jnp.asarray(rng.normal(size=(4 * T, LANES)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(N_FEAT * ROWS, tiles * LANES)
                                  ).astype(np.float32))
    planes23 = jnp.asarray(rng.normal(size=(23 * ROWS, tiles * LANES)
                                      ).astype(np.float32))

    grid = (tiles,)
    full = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                    memory_space=pltpu.VMEM)
    tileN = lambda k: pl.BlockSpec((k, ROWS, LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    tile_cols = lambda r: pl.BlockSpec((r, LANES), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((tiles * ROWS, LANES), jnp.float32)

    @jax.jit
    def run_vpu(tri, o, d):
        return pl.pallas_call(
            functools.partial(_vpu_kernel, iters=iters), grid=grid,
            in_specs=[full((T, LANES)), tileN(3), tileN(3)],
            out_specs=out_spec, out_shape=out_shape,
            interpret=args.interpret)(tri, o, d)

    def run_mxu(k_dim):
        @jax.jit
        def f(coef, feat):
            return pl.pallas_call(
                functools.partial(_mxu_kernel, iters=iters, k_dim=k_dim),
                grid=grid,
                in_specs=[full((4 * T, LANES)),
                          tile_cols(N_FEAT * ROWS)],
                out_specs=out_spec, out_shape=out_shape,
                interpret=args.interpret)(coef, feat)
        return f

    @jax.jit
    def run_mxu_full(coef, feat):
        return pl.pallas_call(
            functools.partial(_mxu_full_kernel, iters=iters),
            grid=grid,
            in_specs=[full((4 * T, LANES)), tile_cols(N_FEAT * ROWS)],
            out_specs=out_spec, out_shape=out_shape,
            interpret=args.interpret)(coef, feat)

    @jax.jit
    def run_relayout(planes):
        return pl.pallas_call(
            functools.partial(_relayout_kernel, iters=iters, n_planes=23),
            grid=grid,
            in_specs=[tile_cols(23 * ROWS)],
            out_specs=out_spec, out_shape=out_shape,
            interpret=args.interpret)(planes)

    dt = _time(run_vpu, tri, o, d)
    print(f"A  VPU MT sweep      : {dt:.4f}s  {pairs / dt / 1e9:7.2f} Gpairs/s")
    for k_dim in (N_FEAT, 16):
        try:
            dt = _time(run_mxu(k_dim), coef, feat)
            print(f"B  MXU k={k_dim:<3d} matmul : {dt:.4f}s  "
                  f"{pairs / dt / 1e9:7.2f} Gpairs/s")
        except Exception as e:  # Mosaic may reject a layout — record it
            print(f"B  MXU k={k_dim} matmul : FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")
    try:
        dt = _time(run_mxu_full, coef, feat)
        print(f"B2 MXU + full epilog : {dt:.4f}s  "
              f"{pairs / dt / 1e9:7.2f} Gpairs/s")
    except Exception as e:
        print(f"B2 MXU + full epilog : FAILED "
              f"{type(e).__name__}: {str(e)[:200]}")
    try:
        dt = _time(run_relayout, planes23)
        print(f"C  relayout floor    : {dt:.4f}s  "
              f"{pairs / dt / 1e9:7.2f} Gpairs/s-equivalent (23 planes, "
              f"no math)")
    except Exception as e:
        print(f"C  relayout floor    : FAILED "
              f"{type(e).__name__}: {str(e)[:200]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
