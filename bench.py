"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): camera rays/sec/chip on a 1080p 100spp
path-traced render at depth 8 on the "One Weekend" random-spheres scene
(~500 spheres, BASELINE config[1] geometry at config[4] resolution and the
BASELINE.json-stated 100spp), rendered with the FUSED MEGAKERNEL engine
(ops/megakernel.py) by default.  rays = width * height * samples (camera
samples; each traces up to max_depth+1 bounces).

vs_baseline: ratio against the value recorded in BASELINE_SELF.json — the
reference publishes no numbers (BASELINE.md), so the baseline is the ROUND-1
self-measured figure and is FROZEN: it only changes when BENCH_UPDATE_BASELINE=1
is set explicitly (round-1's silent first-write is gone).

The default run measures the WHOLE system (VERDICT r3: every BASELINE.md
headline metric appears in the driver-visible line).  Secondary metrics
ride in the same JSON line under "secondary":
  * mesh_scene[_fixed]_sec — OBJ mesh frame time (BASELINE config[2]).
  * big_field_sec — 124k-tri HBM-streamed field, path-8 fixed quirks
    (streaming + auto octant compaction; the coherence-frontier metric).
  * tex_scene_mega_sec — image-textured mesh through fused deferred
    texturing (the reference's active-integrator-shaped workload).
  * big1m_lambert_sec — 1,043,280-tri streamed field, lambert: the
    MAX_STREAM_PRIMS streaming-ceiling metric (the path-8 frontier at this
    scale, ~31.5 s, is stated in PERF.md rather than burned per round).
  * anim_frame_sec — STEADY-STATE per-frame skin+tables+render time on the
    reference workload (1024x512x4spp lambert, low_walking.fbx) — the
    reference's core artifact (render.h:191-237), min-of-K after warmup.
  * fit_step_wavefront_sec / fit_step_mega_diff_sec — differentiable
    training-step time (BASELINE config[3] analog); min-of-K.
  * bwd_fwd_ratio / bwd_fwd_ratio_geom — backward/forward time ratio for
    albedo and GEOMETRY (sphere-center) gradients (a BASELINE.md headline);
    min-of-K both legs (single-shot swung ~15% run-to-run).
  * secondary["vs"] — per-metric PLAIN value ratio (value / recorded)
    against the frozen records in BASELINE_SELF.json["secondary_baseline"].
    Direction depends on the metric: > 1 is faster for *_rays_per_sec,
    SLOWER for *_sec, and for bwd_fwd_ratio* it means the backward got
    relatively slower vs the record (the SCALING_r03 regression class) —
    read the metric name, not just the number.

Env knobs (legs default ON; set =0 to skip during iteration):
BENCH_MESH, BENCH_BIG, BENCH_BIG1M, BENCH_ANIM, BENCH_TEX, BENCH_FIT,
BENCH_BWD, BENCH_WAVEFRONT, BENCH_MEGADIFF
(wavefront engine on the headline workload — a headline metric of its own
since round 4; ~20 s TPU compile at its 16spp shape).  Opt-in extras:
BENCH_TEX_WAVEFRONT=1 (the wavefront leg of the tex comparison),
BENCH_UPDATE_BASELINE=1.  Shape/engine overrides: BENCH_ENGINE
(mega|wavefront), BENCH_SPP, BENCH_WIDTH/HEIGHT, BENCH_CHUNK, BENCH_SCENE
(random_spheres|three_spheres|mesh), BENCH_ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _build_scene(scene_name: str, width: int, height: int):
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets

    if scene_name == "three_spheres":
        return presets.three_spheres(aspect=width / height)
    if scene_name == "mesh":
        return _mesh_scene(width, height)
    return presets.random_spheres(aspect=width / height)


def _mesh_scene(width: int, height: int):
    # BASELINE config[2]: repo OBJ mesh via the fused sweeps
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj

    pts, faces = load_obj("/root/reference/CudaTest/objects/small_bunny.obj")
    pts *= 10.0
    b = crt.SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    b.add_mesh(pts, faces, mat, normals=face_normals(pts, faces),
               reverse_winding=True)
    scene = b.build()
    cam = make_camera((0, 0.4, 2.6), (0, 0.3, 0), (0, 1, 0), 40.0,
                      width / height, 0.0, 10.0)
    return scene, cam


def _big_field_scene():
    """25 replicated bunnies (124k tris) — the HBM-streaming path-8 workload
    (ROUND2_NOTES 'Phased compaction REVISITED')."""
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj

    pts, faces = load_obj("/root/reference/CudaTest/objects/small_bunny.obj")
    pts *= 10.0
    ext = pts.max(0) - pts.min(0)
    b = crt.SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    nrm = face_normals(pts, faces)
    for i in range(5):
        for j in range(5):
            off = np.array([(i - 2) * 1.15 * ext[0], 0.0,
                            -j * 1.3 * ext[2]], np.float32)
            b.add_mesh(pts + off, faces, mat, normals=nrm,
                       reverse_winding=True)
    cam = make_camera((0, 2.2, 3.2), (0.0, 0.35, float(-2.0 * 1.3 * ext[2])),
                      (0, 1, 0), 50.0, 1280 / 720, 0.0, 10.0)
    return b.build(), cam


def _tex_scene(aspect: float):
    """Image-textured workload for BENCH_TEX: the OBJ bunny with a 128x128
    image texture — the scene class that used to fall back to the wavefront
    engine and now renders fused via deferred texturing
    (ops/megakernel.trace_path_mega_tex).  MESH scale is where the fused
    path wins (2.8x measured): the wavefront pays per-prim sweeps there;
    at few-hundred-prim scale the (round-3 consolidated) wavefront is
    ~at parity with the deferred pass (docs/ROUND3_NOTES.md)."""
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj

    pts, faces = load_obj("/root/reference/CudaTest/objects/small_bunny.obj")
    pts *= 10.0
    b = crt.SceneBuilder()
    jj, ii = np.meshgrid(np.arange(128), np.arange(128), indexing="ij")
    tex_img = np.stack([(ii * 5 + jj * 3) % 256, (ii * 11) % 256,
                        (jj * 7) % 256], -1).astype(np.uint8)
    mat = b.materials.lambertian(
        tex_id=b.materials.textures.image(tex_img))
    b.add_mesh(pts, faces, mat, normals=face_normals(pts, faces),
               reverse_winding=True)
    cam = make_camera((0, 0.4, 2.6), (0, 0.3, 0), (0, 1, 0), 40.0,
                      aspect, 0.0, 10.0)
    return b.build(), cam


def _mega_tables(scene):
    """Megakernel tables with Morton-ordered prims (compact chunk boxes so
    the in-kernel per-chunk culling actually prunes)."""
    from cudaraytracer_tpu.ops import megakernel as mk
    from cudaraytracer_tpu.ops.pallas_intersect import morton_order
    tri_order = sph_order = None
    if scene.n_triangles:
        tr = scene.triangles
        tri_order = morton_order(np.asarray(tr.v0), np.asarray(tr.v1),
                                 np.asarray(tr.v2))
    if scene.n_spheres:
        sph_order = mk.mega_sphere_order(scene.spheres.center)
    return mk.build_mega_tables(scene, tri_order, sph_order)


def _timed_render(scene, cam, cfg, isect_fn, n_iters: int, aux=None) -> float:
    """Seconds per frame; K renders inside ONE jitted scan + scalar fetch
    (on the tunnel TPU backend block_until_ready can return early)."""
    import jax
    import jax.numpy as jnp
    from cudaraytracer_tpu.ops.render import render_image

    # scene/aux flow as ARGUMENTS, not closure constants: baked-in literals
    # ship with the HLO upload through this environment's remote-compile
    # tunnel, which rejects large bodies (HTTP 413 at ~0.5 GB — hit by a
    # 1M-triangle table set).
    @jax.jit
    def bench_n(scene, aux, key):
        def body(acc, i):
            img = render_image(scene, cam, jax.random.fold_in(key, i), cfg,
                               isect_fn, aux)
            return acc + jnp.mean(img), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_iters))
        return tot

    float(bench_n(scene, aux, jax.random.key(0)))  # warmup/compile
    t0 = time.perf_counter()
    s = float(bench_n(scene, aux, jax.random.key(123)))
    dt = (time.perf_counter() - t0) / n_iters
    assert s == s, "NaN render"
    return dt


def _big1m_scene():
    """210 replicated bunnies (1,043,280 tris) — the MAX_STREAM_PRIMS
    ceiling workload (the capability that replaces the reference's 2 GB
    device heap, kernel.cu:65).  Same construction as
    docs/experiments/mega_mxu_bench.py field_scene(14, 15)."""
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj

    nx, nz = 14, 15
    pts, faces = load_obj("/root/reference/CudaTest/objects/small_bunny.obj")
    pts *= 10.0
    ext = pts.max(0) - pts.min(0)
    b = crt.SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    nrm = face_normals(pts, faces)
    for i in range(nx):
        for j in range(nz):
            off = np.array([(i - nx // 2) * 1.15 * ext[0], 0.0,
                            -j * 1.3 * ext[2]], np.float32)
            b.add_mesh(pts + off, faces, mat, normals=nrm,
                       reverse_winding=True)
    cam = make_camera((0, 2.2, 3.2),
                      (0.0, 0.35, float(-(nz // 2) * 1.3 * ext[2])),
                      (0, 1, 0), 50.0, 1280 / 720, 0.0, 10.0)
    return b.build(), cam


def _anim_frame_time(n_frames: int = 4):
    """Steady-state seconds/frame of the reference's CORE artifact — the
    per-frame skin -> tables -> render loop (render.h:191-237, kernel.cu:61)
    — at the reference workload config (1024x512x4spp lambert depth-8,
    low_walking.fbx; kernel.cu:44-49, render.h:120 active integrator),
    rendered with the fused mega pipeline as apps/animate.py does.

    Returns min over n_frames of (skin + render) AFTER a warmup frame, so
    compile time stays out (the reference's frame-0 rows carry it; our CSVs
    do too — this leg is the steady-state complement).  Skin runs as its
    own jit with a scalar-fetch sync, exactly like animate.py's timed
    'update' column; tables rebuild from the skinned scene inside the
    render jit (animation requires it)."""
    import jax
    import jax.numpy as jnp

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.models.mesh import device_mesh, scene_with_frame
    from cudaraytracer_tpu.ops import megakernel as megamod
    from cudaraytracer_tpu.ops.pallas_intersect import morton_order
    from cudaraytracer_tpu.ops.render import render_image
    from cudaraytracer_tpu.utils.fbx_loader import load_skinned_mesh

    mesh = load_skinned_mesh("/root/reference/CudaTest/objects/low_walking.fbx")
    cfg = crt.RenderConfig(width=1024, height=512, samples=4, max_depth=8,
                           integrator="lambert", engine="mega")
    camera = presets.fbx_walk_camera(aspect=cfg.aspect)
    dm = device_mesh(mesh)
    b = crt.SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    b.add_mesh(mesh.points, mesh.faces, mat, normals=mesh.normals,
               reverse_winding=True)
    scene0 = b.build()
    mega_order = morton_order(np.asarray(scene0.triangles.v0),
                              np.asarray(scene0.triangles.v1),
                              np.asarray(scene0.triangles.v2))

    @jax.jit
    def update_skin(scene, frame):
        return scene_with_frame(scene, dm, frame)

    @jax.jit
    def mega_step(s, fkey):
        tables = megamod.build_mega_tables(s, tri_order=mega_order)
        return render_image(s, camera, fkey, cfg, None, tables)

    key = jax.random.key(0)

    def frame_time(frame):
        t0 = time.perf_counter()
        s = update_skin(scene0, jnp.int32(frame))
        float(jnp.sum(s.triangles.v0))             # scalar-fetch sync
        img = mega_step(s, jax.random.fold_in(key, frame))
        m = float(jnp.mean(img))
        assert m == m, "NaN animation frame"
        return time.perf_counter() - t0

    frame_time(0)                                  # warmup/compile
    return min(frame_time(f) for f in range(1, 1 + n_frames))


def _bwd_fwd_ratios(scene, cam, cfg, n_reps: int = 3):
    """(albedo_ratio, geometry_ratio): backward/forward wall ratio for
    texture-albedo grads and sphere-CENTER grads (scatter-add VJP path).

    min-of-K on BOTH legs: the single-shot ratios swung ~15% run-to-run
    (0.905 vs 1.038 same code — VERDICT r4 weak #3), and the first
    post-warmup call can include a remote-tunnel compile of the timing
    rig's own tiny ops (ROUND4_NOTES §12)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from cudaraytracer_tpu.ops.render import render_pixels

    gcfg = dataclasses.replace(cfg, width=256, height=256, samples=4,
                               gamma=False, ray_chunk=1 << 17,
                               engine="wavefront",
                               wavefront_kernel_attrs=True)
    pix = jnp.arange(gcfg.width * gcfg.height, dtype=jnp.int32)
    gkey = jax.random.key(5)
    # the production gradient path: Pallas sweep pair + attrs kernel (the
    # r4 advisor caught these legs silently measuring the brute-force jnp
    # intersect); CPU dev runs keep brute force (interpret-mode pallas)
    from cudaraytracer_tpu.ops.render import pallas_intersector_pair
    isect = (pallas_intersector_pair(gcfg)
             if jax.default_backend() == "tpu" else None)

    def ratio(install):
        @jax.jit
        def fwd(p):
            return jnp.mean(render_pixels(install(p), cam, gkey, gcfg, pix,
                                          isect))

        grad_fn = jax.jit(jax.grad(lambda p: fwd(p)))
        p0 = install.init
        float(fwd(p0))                        # warmup/compile
        jax.block_until_ready(grad_fn(p0))
        t_f = t_b = float("inf")
        for _ in range(n_reps):
            t0 = time.perf_counter()
            float(fwd(p0))
            t_f = min(t_f, time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(grad_fn(p0))
            t_b = min(t_b, time.perf_counter() - t0)
        return max(t_b - t_f, 0.0) / max(t_f, 1e-9)

    class Albedo:
        init = scene.textures.color0

        def __call__(self, p):
            return scene._replace(textures=scene.textures._replace(color0=p))

    class Centers:
        init = scene.spheres.center

        def __call__(self, p):
            return scene._replace(spheres=scene.spheres._replace(center=p))

    return ratio(Albedo()), ratio(Centers())


def _fit_step_times(n_steps: int = 4):
    """Seconds per training step (value_and_grad + SGD on albedo AND sphere
    centers, 512x256x4spp depth-4 three_spheres) for the wavefront engine vs
    engine='mega_diff' (fused forward + replay backward, cfg.mega_replay_bwd).
    Steps run inside ONE jitted scan with a scalar fetch (tunnel-safe
    timing); mega tables rebuild from the moving scene inside the step, as a
    geometry fit requires."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.integrators import integrate
    from cudaraytracer_tpu.core.camera import generate_pixel_rays

    scene, cam = presets.three_spheres(aspect=2.0)
    base = crt.RenderConfig(width=512, height=256, samples=4, max_depth=4,
                            gamma=False, wavefront_kernel_attrs=True)
    rays = generate_pixel_rays(cam, base.width, base.height, base.samples,
                               jax.random.key(0))
    key = jax.random.key(1)
    target = integrate(scene, rays, key, base)
    p0 = {"albedo": scene.textures.color0 * 0.6 + 0.1,
          "centers": scene.spheres.center + 0.05}

    def time_engine(engine):
        cfg = dataclasses.replace(base, engine=engine)
        # wavefront leg rides the production Pallas pair on TPU (see
        # _bwd_fwd_ratios note); mega_diff ignores intersect_fn
        isect = None
        if engine == "wavefront" and jax.default_backend() == "tpu":
            from cudaraytracer_tpu.ops.render import pallas_intersector_pair
            isect = pallas_intersector_pair(cfg)

        def loss(p):
            s = scene._replace(
                spheres=scene.spheres._replace(center=p["centers"]),
                textures=scene.textures._replace(color0=p["albedo"]))
            return jnp.mean((integrate(s, rays, key, cfg, isect) - target)
                            ** 2)

        @jax.jit
        def run(p):
            def body(p, _):
                l, g = jax.value_and_grad(loss)(p)
                return jax.tree.map(lambda x, gx: x - 0.5 * gx, p, g), l
            p, ls = jax.lax.scan(body, p, None, length=n_steps)
            return ls[-1]

        float(run(p0))                      # warmup/compile
        dt = float("inf")
        for _ in range(2):                  # min-of-K (VERDICT r4 weak #3)
            t0 = time.perf_counter()
            l = float(run(p0))
            dt = min(dt, (time.perf_counter() - t0) / n_steps)
        assert l == l, "NaN fit loss"
        return dt

    return time_engine("wavefront"), time_engine("mega_diff")


def main() -> int:
    import jax

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.ops.render import pallas_intersector

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    # 100spp: the BASELINE.json-stated headline config (VERDICT r3 weak #7
    # flagged the 16spp drift).  rays/s is ~spp-invariant; the chunked
    # render driver keeps memory flat (rays generate per 2^17-lane chunk).
    spp = int(os.environ.get("BENCH_SPP", 100))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))
    scene_name = os.environ.get("BENCH_SCENE", "random_spheres")
    engine = os.environ.get("BENCH_ENGINE", "mega")
    n_iters = int(os.environ.get("BENCH_ITERS", 2))

    scene, cam = _build_scene(scene_name, width, height)
    cfg = crt.RenderConfig(width=width, height=height, samples=spp,
                           max_depth=8, integrator="path", ray_chunk=chunk,
                           engine=engine)
    isect_fn, aux = None, None
    if engine == "wavefront":
        isect_fn = pallas_intersector(cfg)
    else:
        aux = _mega_tables(scene)

    dt = _timed_render(scene, cam, cfg, isect_fn, n_iters, aux)
    rays = width * height * spp
    value = rays / dt

    secondary = {"engine": engine, "frame_sec": round(dt, 4)}

    if os.environ.get("BENCH_MESH", "1") == "1" and scene_name != "mesh":
        mscene, mcam = _mesh_scene(1280, 720)
        import dataclasses
        mcfg = dataclasses.replace(cfg, width=1280, height=720, samples=8)
        if engine == "wavefront":
            m_isect, m_aux = pallas_intersector(mcfg), None
        else:
            m_isect, m_aux = None, _mega_tables(mscene)
        mdt = _timed_render(mscene, mcam, mcfg, m_isect, n_iters, m_aux)
        secondary["mesh_scene_sec"] = round(mdt, 4)
        secondary["mesh_scene_rays_per_sec"] = round(1280 * 720 * 8 / mdt, 1)
        # Same workload under Quirks.fixed() — the PHYSICAL mesh-path metric.
        # Under Quirks.reference() mesh path tracing is (faithfully)
        # degenerate: triangle.h:92-94 never clips t, so bounce rays re-hit
        # their own triangle at t~0 and behind-the-ray boxes can never be
        # culled (the reference never renders this config — its path tracer
        # is commented out at render.h:119, and its active BVH pipeline
        # prunes behind-boxes via the AABB t-window, aabb.h:30-43).  The
        # fixed profile excludes self-hits, so rays move, die, and the
        # in-kernel forward-window culling prunes — the honest measure of
        # mesh path-tracing speed.
        fcfg = dataclasses.replace(mcfg, quirks=crt.Quirks.fixed())
        f_isect = pallas_intersector(fcfg) if engine == "wavefront" else None
        fdt = _timed_render(mscene, mcam, fcfg, f_isect, n_iters, m_aux)
        secondary["mesh_scene_fixed_sec"] = round(fdt, 4)
        secondary["mesh_scene_fixed_rays_per_sec"] = round(
            1280 * 720 * 8 / fdt, 1)

    if os.environ.get("BENCH_BIG", "1") == "1":
        # 25-bunny 124k-tri streamed field, path-8 fixed quirks: exercises
        # HBM streaming + the auto octant compaction (~2 min).
        import dataclasses
        bscene, bcam = _big_field_scene()
        bcfg = dataclasses.replace(cfg, width=1280, height=720, samples=8,
                                   quirks=crt.Quirks.fixed(), engine="mega")
        baux = _mega_tables(bscene)
        bdt = _timed_render(bscene, bcam, bcfg, None, n_iters, baux)
        secondary["big_field_sec"] = round(bdt, 4)
        secondary["big_field_tris"] = int(bscene.n_triangles)

    if os.environ.get("BENCH_TEX", "1") == "1":
        # image-textured bunny (1280x720x8 path-8, fixed quirks): fused
        # deferred texturing (engine='mega' -> trace_path_mega_tex); the
        # wavefront comparison leg stays opt-in (slow compile).
        import dataclasses
        tscene, tcam = _tex_scene(1280 / 720)
        tcfg = dataclasses.replace(cfg, width=1280, height=720, samples=8,
                                   engine="mega", quirks=crt.Quirks.fixed())
        tdt = _timed_render(tscene, tcam, tcfg, None, n_iters,
                            _mega_tables(tscene))
        secondary["tex_scene_mega_sec"] = round(tdt, 4)
        secondary["tex_scene_mega_rays_per_sec"] = round(
            1280 * 720 * 8 / tdt, 1)
        if os.environ.get("BENCH_TEX_WAVEFRONT", "0") == "1":
            wtcfg = dataclasses.replace(tcfg, engine="wavefront")
            wtdt = _timed_render(tscene, tcam, wtcfg,
                                 pallas_intersector(wtcfg), n_iters)
            secondary["tex_scene_wavefront_sec"] = round(wtdt, 4)

    if os.environ.get("BENCH_BIG1M", "1") == "1":
        # 1M-tri streamed field, LAMBERT (the cheap default leg — path-8 at
        # this scale is the known 31.5 s frontier, stated in PERF.md): makes
        # the MAX_STREAM_PRIMS streaming ceiling driver-visible.
        import dataclasses
        gscene, gcam = _big1m_scene()
        gcfg = dataclasses.replace(cfg, width=1280, height=720, samples=8,
                                   integrator="lambert",
                                   quirks=crt.Quirks.fixed(), engine="mega")
        gdt = _timed_render(gscene, gcam, gcfg, None, n_iters,
                            _mega_tables(gscene))
        secondary["big1m_lambert_sec"] = round(gdt, 4)
        secondary["big1m_tris"] = int(gscene.n_triangles)

    if os.environ.get("BENCH_ANIM", "1") == "1":
        # steady-state per-frame animation loop — the reference's core
        # artifact (render.h:191-237); min-of-K after a warmup frame.
        secondary["anim_frame_sec"] = round(_anim_frame_time(), 4)

    if os.environ.get("BENCH_WAVEFRONT", "1") == "1":
        # default ON since round 4: the differentiable engine is a headline
        # metric in its own right (14.1M rays/s after the alive-mask +
        # Morton-cull + dec-fold work) and its compile is ~20 s at 16spp.
        # 16spp regardless of BENCH_SPP: rays/s is ~spp-invariant and the
        # 100spp wavefront program compiles ~5x slower through the tunnel.
        import dataclasses
        wcfg = dataclasses.replace(cfg, engine="wavefront", samples=16)
        wdt = _timed_render(scene, cam, wcfg, pallas_intersector(wcfg),
                            n_iters)
        secondary["wavefront_rays_per_sec"] = round(
            width * height * 16 / wdt, 1)

    if os.environ.get("BENCH_MEGADIFF", "1") == "1":
        # the FUSED differentiable forward (engine='mega_diff': winner-
        # recording megakernel + replay backward; gradients pinned equal to
        # the wavefront VJP by tests/test_replay.py).  The differentiable
        # family has two forwards — this one wins at render scale (18.4M
        # r5), the Pallas-pair wavefront wins at fit shapes (ROUND5_NOTES
        # §10); 16spp like the wavefront leg.
        import dataclasses
        mdcfg = dataclasses.replace(cfg, engine="mega_diff", samples=16)
        md_aux = aux if aux is not None else _mega_tables(scene)
        mddt = _timed_render(scene, cam, mdcfg, None, n_iters, md_aux)
        secondary["mega_diff_fwd_rays_per_sec"] = round(
            width * height * 16 / mddt, 1)

    if os.environ.get("BENCH_FIT", "1") == "1":
        wdt_f, mdt_f = _fit_step_times()
        secondary["fit_step_wavefront_sec"] = round(wdt_f, 4)
        secondary["fit_step_mega_diff_sec"] = round(mdt_f, 4)

    if os.environ.get("BENCH_BWD", "1") == "1":
        from cudaraytracer_tpu.models import presets
        ts, tcam = presets.three_spheres(aspect=1.0)
        alb, geo = _bwd_fwd_ratios(ts, tcam, cfg)
        secondary["bwd_fwd_ratio"] = round(alb, 3)
        secondary["bwd_fwd_ratio_geom"] = round(geo, 3)

    # --- baseline: FROZEN round-1 record; explicit update only ---
    here = os.path.dirname(os.path.abspath(__file__))
    baseline_path = os.path.join(here, "BASELINE_SELF.json")
    record = {}
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                record = json.load(f)
        except Exception:
            record = {}
    prior = record.get("camera_rays_per_sec")
    vs = value / float(prior) if prior else 1.0
    # per-metric comparisons against the frozen secondary_baseline block
    # (plain value ratios; see module docstring for direction semantics)
    sec_base = record.get("secondary_baseline", {})
    vs_sec = {}
    for k, v in secondary.items():
        b = sec_base.get(k)
        if isinstance(b, (int, float)) and isinstance(v, (int, float)) and b:
            vs_sec[k] = round(v / b, 4)
    if vs_sec:
        secondary["vs"] = vs_sec
    if os.environ.get("BENCH_UPDATE_BASELINE", "0") == "1":
        # persist MEASUREMENTS only — not the derived 'vs' comparison block
        # (a stored vs would masquerade as a recorded metric next round).
        # secondary_baseline (what the vs block reads) is re-seeded too —
        # the r4 flow updated only 'secondary', leaving the comparison
        # records stale-semantics forever (VERDICT r4 weak #3); the _note
        # should be updated IN THE SAME COMMIT to log why.
        sec_meas = {k: v for k, v in secondary.items()
                    if k != "vs" and isinstance(v, (int, float))}
        new_sec_base = dict(record.get("secondary_baseline", {}))
        new_sec_base.update(sec_meas)
        record.update({
            "camera_rays_per_sec": value,
            "config": f"{width}x{height}x{spp}spp depth8 {scene_name} "
                      f"engine={engine}",
            "backend": jax.devices()[0].platform,
            "secondary": {k: v for k, v in secondary.items() if k != "vs"},
            "secondary_baseline": new_sec_base,
        })
        with open(baseline_path, "w") as f:
            json.dump(record, f, indent=2)

    print(json.dumps({
        "metric": "camera_rays_per_sec_1080p_path8",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
        "secondary": secondary,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
