"""124k-tri field: WHERE do the 8.9 s/frame go?

Collects per-bounce ray states by running 1-step kernel windows
(dump_state) with the production octant compaction applied between
windows (ce2), times each window, and computes per-(tile, segment) slab
reachability OUTSIDE the kernel in jnp — the union-of-work the kernel
must visit (upper bound: best_t = inf, alive-masked).  Comparing
  visits x (SEG_T x 4096 / 42G pairs/s)      [sweep-math model]
against the measured per-bounce wall time separates sweep-bound from
walk/DMA/cond-overhead-bound.  Run solo on the TPU.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops import megakernel as mk
from bench import _big_field_scene, _mega_tables
from cudaraytracer_tpu.core.camera import generate_pixel_rays
from cudaraytracer_tpu.ops.render import _swizzled_pixels

W, H, SPP, DEPTH = 1280, 720, 8, 8
COMPACT_EVERY = 2
scene, cam = _big_field_scene()
tables = _mega_tables(scene)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=DEPTH,
                       integrator="path", engine="mega", ray_chunk=1 << 17,
                       quirks=crt.Quirks.fixed(), compact_auto=False)
n_segs = tables.tri.shape[0] // mk.SEG_T
print(f"{scene.n_triangles} tris, {n_segs} segments", flush=True)

pix = _swizzled_pixels(W, H)
rays = generate_pixel_rays(cam, W, H, SPP, jax.random.key(0), pix)
n = rays.origin.shape[0]
rows = mk._ray_rows(n)
rl = rows * mk.LANES
lanes_per_tile = mk.TILE_ROWS * mk.LANES
tiles = rl // lanes_per_tile
print(f"{n} rays, {tiles} tiles", flush=True)

o_cur = jnp.stack([mk._pad_rays(rays.origin[:, k], rows)
                   for k in range(3)]).reshape(3, rl)
d_cur = jnp.stack([mk._pad_rays(rays.direction[:, k], rows)
                   for k in range(3)]).reshape(3, rl)
state = None


def call1(o, d, st, step):
    return mk._mega_call(
        scene, o.reshape(3, rows, mk.LANES), d.reshape(3, rows, mk.LANES),
        jax.random.key(7), cfg, tables,
        state=None if st is None else st.reshape(4, rows, mk.LANES),
        dump_state=True, step_lo=step, n_steps=1)


call1_first = jax.jit(lambda o, d: call1(o, d, None, 0))
call1_mid = jax.jit(call1, static_argnames=("step",))


@jax.jit
def octant_order(o2, d2, alive_f):
    alive = alive_f > 0.0
    code = (mk._morton_u32(o2[0], o2[1], o2[2]).astype(jnp.int32)
            & 0x3FFFFFFF)
    oct_ = (((d2[0] < 0).astype(jnp.int32) << 2)
            | ((d2[1] < 0).astype(jnp.int32) << 1)
            | (d2[2] < 0).astype(jnp.int32))
    cs = mk._OCT_COARSE_SHIFT
    skey = (((code >> cs) << cs) | (oct_ << (cs - 3))
            | ((code >> 3) & ((1 << (cs - 3)) - 1)))
    return jnp.argsort(jnp.where(alive, skey, jnp.int32(2 ** 31 - 2)))


@jax.jit
def seg_tile_visits(o, d, alive):
    boxes = tables.tri_seg[:n_segs, :6]
    inv = 1.0 / d

    def one_seg(s):
        t0 = (boxes[s, 0:3, None] - o) * inv
        t1 = (boxes[s, 3:6, None] - o) * inv
        near = jnp.max(jnp.minimum(t0, t1), axis=0)
        far = jnp.min(jnp.maximum(t0, t1), axis=0)
        reach = ~((far < near) | (far < 1e-3)) & (alive > 0)
        return jnp.any(reach.reshape(tiles, lanes_per_tile), axis=1)

    return jnp.stack([one_seg(s) for s in range(n_segs)])


PAIR_RATE = 42e9
tot_model = tot_wall = 0.0
for b in range(DEPTH + 1):
    alive = (jnp.ones((rl,)) if state is None else state[3])
    vis = np.asarray(seg_tile_visits(o_cur, d_cur, alive))
    n_vis = int(vis.sum())
    alive_frac = float(jnp.mean((alive > 0).astype(jnp.float32)))
    live_tiles = int(np.asarray(
        jnp.any((alive > 0).reshape(tiles, lanes_per_tile), axis=1)).sum())
    model = n_vis * mk.SEG_T * lanes_per_tile / PAIR_RATE
    fn = ((lambda: call1_first(o_cur, d_cur)) if state is None
          else (lambda: call1_mid(o_cur, d_cur, state, b)))
    float(jnp.sum(fn()[0]))         # warmup/compile (per-step retrace)
    t0 = time.perf_counter()
    out = fn()
    float(jnp.sum(out[0]))          # tunnel-safe scalar fetch
    wall = time.perf_counter() - t0
    flat = out.reshape(13, rl)
    print(f"bounce {b}: alive {alive_frac:6.1%} ({live_tiles} live tiles) "
          f"seg-visits {n_vis:7d} ({n_vis / max(live_tiles, 1):5.1f}/live-"
          f"tile)  sweep-model {model:6.2f}s  wall {wall:6.2f}s",
          flush=True)
    tot_model += model
    tot_wall += wall
    o_cur, d_cur = flat[3:6], flat[6:9]
    state = jnp.concatenate([flat[9:12], flat[12:13]])
    if (b + 1) % COMPACT_EVERY == 0 and b < DEPTH:
        order = octant_order(o_cur, d_cur, state[3])
        o_cur = o_cur[:, order]
        d_cur = d_cur[:, order]
        state = state[:, order]
print(f"TOTAL: sweep-model {tot_model:.2f}s  wall {tot_wall:.2f}s "
      f"(wall incl. per-call dispatch + compile-cache hits; frame-level "
      f"measured ~8.9s with ce2+f2b8)", flush=True)
