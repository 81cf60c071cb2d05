"""Inverse-rendering demo — BASELINE config[3]: recover sphere positions and
albedos from a target image by gradient descent on pixel loss.

The target is rendered from the true scene; the fit starts from perturbed
parameters and optimizes them with the distributed fit step (pixels sharded
over 'dp', grads all-reduced).  Run on CPU with a virtual mesh or on TPU.

Usage: python apps/fit.py [--steps N] [--devices N] [--tp N] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=54)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cpu-devices", type=int, default=8)
    ap.add_argument("--engine", default="wavefront",
                    choices=["wavefront", "mega_diff"],
                    help="wavefront = Pallas sweep pair + attrs kernel "
                         "(default since the round-4 re-measurement: the "
                         "old 'wavefront 0.374 s/step' figure was the "
                         "brute-force jnp fallback — the real Pallas "
                         "wavefront fits at 0.073 s/step on three_spheres "
                         "/ 0.116 at 484 spheres vs mega_diff's 0.160 / "
                         "0.184, ROUND4_NOTES §20).  mega_diff = fused "
                         "megakernel forward recording each bounce's "
                         "winner + a replay backward that gathers only "
                         "those winners (cfg.mega_replay_bwd; exact "
                         "grads, no re-sweep).")
    ap.add_argument("--out", default="/tmp/fit")
    ap.add_argument("--checkpoint-every", type=int, default=25,
                    help="save params every N steps (0 disables)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <out>/fit_ckpt.npz if present")
    args = ap.parse_args(argv)
    if args.steps < 1:
        ap.error("--steps must be >= 1")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax.numpy as jnp
    import numpy as np

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.render import render_image
    from cudaraytracer_tpu.parallel.mesh import make_mesh
    from cudaraytracer_tpu.parallel.train import apply_sphere_params, fit
    from cudaraytracer_tpu.utils.image import write_png

    scene, cam = presets.three_spheres(aspect=args.width / args.height)
    cfg = crt.RenderConfig(width=args.width, height=args.height,
                           samples=args.samples, max_depth=4,
                           integrator="path", gamma=False,
                           engine=args.engine,
                           # gradient workload: grad-optimized sweep form
                           # (config.py wavefront_kernel_attrs)
                           wavefront_kernel_attrs=True)

    target = render_image(scene, cam, jax.random.key(1234), cfg)
    os.makedirs(args.out, exist_ok=True)
    write_png(os.path.join(args.out, "target.png"), np.sqrt(np.asarray(target)))

    rng = np.random.default_rng(0)
    true_centers = np.asarray(scene.spheres.center)
    true_albedo = np.asarray(scene.textures.color0)
    params = {
        "centers": jnp.asarray(true_centers
                               + rng.normal(scale=0.08, size=true_centers.shape)
                               .astype(np.float32)),
        "albedo": jnp.asarray(np.clip(
            true_albedo + rng.normal(scale=0.15, size=true_albedo.shape)
            .astype(np.float32), 0.0, 1.0)),
    }

    init_scene = apply_sphere_params(scene, params)
    write_png(os.path.join(args.out, "init.png"),
              np.sqrt(np.asarray(render_image(init_scene, cam,
                                              jax.random.key(7), cfg))))

    mesh = make_mesh(args.devices, tp=args.tp)
    print(f"mesh: {dict(mesh.shape)}  devices: {mesh.devices.size}")
    c_err0 = float(np.abs(true_centers - np.asarray(params["centers"])).max())
    a_err0 = float(np.abs(true_albedo - np.asarray(params["albedo"])).max())

    # checkpoint/resume (utils/checkpoint.py): fits survive the observed
    # transient TPU-worker crashes instead of restarting from step 0
    from cudaraytracer_tpu.utils.checkpoint import load_params, save_params
    ckpt_path = os.path.join(args.out, "fit_ckpt.npz")
    step0 = 0
    if args.resume and os.path.exists(ckpt_path):
        loaded, step0, _ = load_params(ckpt_path)
        params = {k: jnp.asarray(v) for k, v in loaded.items()}
        print(f"resumed {ckpt_path} at step {step0}")

    losses = []
    fitted = params
    remaining = max(args.steps - step0, 0)
    chunk = (args.checkpoint_every if args.checkpoint_every > 0
             else remaining)
    done = step0
    while remaining > 0:
        n = min(chunk, remaining)
        fitted, ls = fit(scene, fitted, cam, cfg, mesh, target,
                         steps=n, lr=args.lr, verbose=True,
                         key=jax.random.fold_in(jax.random.key(0), done))
        losses.extend(ls)
        done += n
        remaining -= n
        if args.checkpoint_every > 0:
            save_params(ckpt_path, fitted, done)
    if not losses:   # resumed past the requested step count
        print(f"checkpoint already at step {step0} >= --steps {args.steps}; "
              "nothing to do")
        return 0

    c_err1 = float(np.abs(true_centers - np.asarray(fitted["centers"])).max())
    a_err1 = float(np.abs(true_albedo - np.asarray(fitted["albedo"])).max())
    print(f"center err: {c_err0:.4f} -> {c_err1:.4f}")
    print(f"albedo err: {a_err0:.4f} -> {a_err1:.4f}")
    print(f"loss: {losses[0]:.6f} -> {losses[-1]:.6f}")

    final_scene = apply_sphere_params(scene, fitted)
    write_png(os.path.join(args.out, "fitted.png"),
              np.sqrt(np.asarray(render_image(final_scene, cam,
                                              jax.random.key(7), cfg))))
    print(f"wrote {args.out}/target.png, init.png, fitted.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
