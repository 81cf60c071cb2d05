import sys, time, dataclasses
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.ops.integrators import integrate
from cudaraytracer_tpu.ops.render import pallas_intersector_pair
from cudaraytracer_tpu.core.camera import generate_pixel_rays

def fit_time(scene, cam, isect, cfg, n_steps=4):
    rays = generate_pixel_rays(cam, cfg.width, cfg.height, cfg.samples,
                               jax.random.key(0))
    key = jax.random.key(1)
    target = integrate(scene, rays, key, cfg, isect)
    p0 = {"albedo": scene.textures.color0 * 0.6 + 0.1,
          "centers": scene.spheres.center + 0.05}

    def loss(p):
        s = scene._replace(
            spheres=scene.spheres._replace(center=p["centers"]),
            textures=scene.textures._replace(color0=p["albedo"]))
        return jnp.mean((integrate(s, rays, key, cfg, isect) - target) ** 2)

    @jax.jit
    def run(p):
        def body(p, _):
            l, g = jax.value_and_grad(loss)(p)
            return jax.tree.map(lambda x, gx: x - 0.5 * gx, p, g), l
        p, ls = jax.lax.scan(body, p, None, length=n_steps)
        return ls[-1]
    float(run(p0))
    t0 = time.perf_counter()
    l = float(run(p0))
    return (time.perf_counter() - t0) / n_steps

base = crt.RenderConfig(width=512, height=256, samples=4, max_depth=4,
                        gamma=False, engine="wavefront")
for name, mk_scene in (("three_spheres", lambda: presets.three_spheres(aspect=2.0)),
                       ("random_spheres", lambda: presets.random_spheres(aspect=2.0))):
    scene, cam = mk_scene()
    for leg, isect, cfgx in (
            ("brute (prod today)", None, base),
            ("pallas pair", "P", base),
            ("pallas pair + attrs", "P",
             dataclasses.replace(base, wavefront_kernel_attrs=True))):
        i = pallas_intersector_pair(cfgx) if isect else None
        dt = fit_time(scene, cam, i, cfgx)
        print(f"{name:15s} {leg:22s}: {dt:.4f} s/step", flush=True)

# mega_diff comparison on both scenes (the current fit default engine)
for name, mk_scene in (("three_spheres", lambda: presets.three_spheres(aspect=2.0)),
                       ("random_spheres", lambda: presets.random_spheres(aspect=2.0))):
    scene, cam = mk_scene()
    mcfg = dataclasses.replace(base, engine="mega_diff")
    dt = fit_time(scene, cam, None, mcfg)
    print(f"{name:15s} mega_diff             : {dt:.4f} s/step", flush=True)
