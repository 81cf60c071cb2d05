"""Render configuration and reference-quirk flags.

The reference (chocorone/CudaRaytracer) has no config system: everything is a
compile-time constant (CudaTest/src/kernel.cu:44-51) or a commented-out line acting
as a menu (render.h:119-121 integrator choice, kernel.cu:93-97 pipeline choice).
This module replaces that with real dataclasses.

Quirks are deliberate behaviors of the reference that differ from a textbook
ray tracer.  Each flag cites the reference line it reproduces.  ``Quirks.reference()``
matches the CUDA renderer bit-for-bit in deterministic components;
``Quirks.fixed()`` is the physically-corrected profile.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Quirks:
    """Reference-compat switches (see SURVEY.md section 'Reference quirks')."""

    # triangle.h:61 — `if (dot(r.direction(), normal) < 0) return false;`
    # Only faces whose normal points *away* from the ray are hit (back faces).
    triangle_backface_only: bool = True

    # triangle.h:92-94 — Moller-Trumbore result `t` is never tested against
    # t_min/t_max; only the caller's closest-so-far check (hitable_list.h:84)
    # applies, so even negative t can register as a hit.
    triangle_no_t_clip: bool = True

    # render.h:61 — on scatter failure or depth exhaustion the path tracer
    # returns emitted + vec3(0.1) instead of emitted only.
    ambient_on_absorb: float = 0.1

    # render.h:80 — LambertShade uses dot(r.direction(), normal) with the
    # UNNORMALIZED camera-ray direction.
    lambert_unnormalized_dot: bool = True

    # createScene.h:99-109 — per-frame skinning rewrites triangle vertices but
    # never recomputes the stored face normal; loaded bind-pose normals persist.
    fixed_face_normals: bool = True

    # material.h dielectric scatter: cosine for Schlick on the exiting side is
    # sqrt(1 - ri^2 (1 - cos^2)) (a nonstandard form); kept verbatim.
    dielectric_reference_cosine: bool = True

    # material.h:67 — Lambertian::scatter samples its texture at
    # `albedo->value(0, 0, rec.p)`: u = v = 0 ALWAYS, so an image-textured
    # lambertian renders as the single (0, ny-1) texel color.  Only IMAGE
    # textures are affected (checker uses p, constant neither).  The fixed
    # profile samples at the hit's real (u, v).
    lambertian_zero_uv: bool = True

    # triangle.h:74 — `if (a < EPSILON && backCulling) return false;` rejects
    # FRONT-determinant rays when the per-triangle backCulling flag is set.
    # Every triangle the reference actually builds passes cull=false
    # (createScene.h:185), and the unconditional two-sided test at
    # triangle.h:77-78 (`a > -EPSILON && a < EPSILON`) always applies, so the
    # default False matches the active pipeline exactly.
    triangle_back_culling: bool = False

    @staticmethod
    def reference() -> "Quirks":
        return Quirks()

    @staticmethod
    def fixed() -> "Quirks":
        return Quirks(
            triangle_backface_only=False,
            triangle_no_t_clip=False,
            ambient_on_absorb=0.0,
            lambert_unnormalized_dot=False,
            fixed_face_normals=False,
            dielectric_reference_cosine=False,
            lambertian_zero_uv=False,
            triangle_back_culling=False,
        )


# Integrator names; the reference selects among these by (un)commenting
# render.h:119-121.  'path' == shade(), 'lambert' == LambertShade() (the active
# one), 'normal' == shade_normal().
INTEGRATORS = ("path", "lambert", "normal")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Equivalent of the constants at kernel.cu:44-51."""

    width: int = 1024            # nx  (kernel.cu:44, RESOLUTION=1 render.h:26)
    height: int = 512            # ny  (kernel.cu:45)
    samples: int = 4             # samples per pixel (kernel.cu:49)
    max_depth: int = 8           # bounce depth (kernel.cu:48)
    integrator: str = "path"     # render.h:119-121 menu
    t_min: float = 1e-3          # render.h:53 world->hit(r, 0.001, FLT_MAX, ...)
    t_max: float = 3.4028235e38  # FLT_MAX
    gamma: bool = True           # render.h:124-126 sqrt gamma
    # render.h:128 clip to [0,1].  Internal knob: sample-parallel sharding
    # disables it per member so partial means stay linear for the pmean.
    clip: bool = True
    quirks: Quirks = dataclasses.field(default_factory=Quirks.reference)
    # Rays are processed in chunks of this many pixels*samples to bound memory.
    ray_chunk: int = 1 << 18
    dtype: str = "float32"
    # 'wavefront': per-bounce intersect + XLA shading (differentiable, any
    # scene).  'mega': the fused Pallas megakernel (ops/megakernel.py) — the
    # whole bounce loop in one kernel, forward-only, spheres+triangles scenes;
    # unsupported scenes fall back to wavefront automatically.
    # 'mega_diff': DIFFERENTIABLE hybrid — megakernel forward driven by an
    # injected sample stream, wavefront backward replaying the same stream
    # (exact gradients, fused forward; path integrator only).
    engine: str = "wavefront"
    # engine='wavefront' only: stably PARTITION the ray batch alive-first
    # between bounces (two cumsums + ~15 O(N) gathers — no sort) so dead
    # lanes collapse into tail tiles the alive-masked Pallas sweeps skip.
    # MEASURED NEGATIVE on TPU at headline scale (3.30 -> 14.78 s/frame):
    # arbitrary-permutation gathers cost ~3.5 ms per M-indices on v5e, so
    # ~15 planes x 33M lanes x 9 bounces is ~4x the sweep work it saves,
    # despite per-bounce alive decaying [100, 83, 32, 16, 8, 5, 3, 2, 2]%
    # (docs/ROUND4_NOTES.md §11).  Kept as a tested knob; default off.
    # Bit-exact ONLY under an injected SampleStream (the stream rides the
    # permutation); with key-derived sampling the reordered lanes consume
    # different per-position draws — statistically identical image,
    # different pixels (r4 review).
    wavefront_compact: bool = False
    # Sphere-sweep culling policy for the Pallas wavefront intersectors
    # (ops/intersect.intersect_scene_pallas):
    #   'morton'  — chunk-box culling on EVERY bounce over spheres permuted
    #               into Morton order in-trace (winner ids mapped back; on
    #               exact-t ties the winner follows Morton order, the same
    #               caveat the mega tables carry).  The megakernel's recipe,
    #               brought to the wavefront.
    #   'primary' — cull coherent primary sweeps only (rounds 1-4 behavior;
    #               the round-1 'culling loses 15% on bounces' measurement
    #               predates the alive-vote exclusion and spatial ordering).
    #   'off'     — never cull sphere sweeps.
    wavefront_sphere_cull: str = "morton"
    # Pure-sphere scenes only: the sweep kernel carries the winner's
    # attribute row ([center, radius, mat, decode columns]) out of the
    # kernel, so the hit record builds with ZERO per-ray gathers.  Measured
    # on v5e (ROUND4_NOTES §17): FORWARD loses ~6% (the in-kernel attr
    # carries cost more than the one winner-row gather they replace) but
    # GRADIENTS win 16-19% (the backward drops the gather VJP scatter and
    # reads the winner's center/radius from the saved attrs).  Default off;
    # the fit paths (parallel/train.make_fit_step, apps/fit, bench fit
    # legs) enable it — the wavefront is the gradients engine.
    wavefront_kernel_attrs: bool = False
    # engine='wavefront', TPU only: draw the per-bounce scatter samples
    # (unit ball + uniform) with the hardware PRNG in a tiny Pallas kernel
    # (pallas_intersect.scatter_draws_pallas) instead of threefry in XLA —
    # the threefry draws measured ~0.15 s of the 2.25 s headline frame
    # (ROUND5_NOTES §10).  Distribution identical to the megakernel's
    # in-kernel sampler (Box-Muller + cbrt radius, round-2 distribution-
    # checked); seeding derives from the bounce key, so remats/replays of
    # the same key reproduce the same samples.  Ignored off-TPU and
    # whenever a SampleStream is injected (the deterministic parity mode
    # keeps bit-equality with stream_from_key).
    wavefront_tpu_prng: bool = True
    # engine='mega' only: after this many bounces, SORT the wavefront (dead
    # rays last, alive rays in Morton order of their scatter origin) and
    # resume in a second fused kernel — dead tiles then early-out and alive
    # tiles stay spatially coherent for the box culling.  0 = off.  Wins on
    # scenes where many primaries miss (meshes over sky).
    compact_after: int = 0
    # engine='mega' only: run the fused bounce loop in windows of this many
    # bounces and stably PARTITION the wavefront alive-first between windows
    # (two cumsums + gather — no sort; ops/megakernel.trace_path_mega_phased).
    # Dead rays collapse into tail tiles that hit the kernel's tile-level
    # early-out while alive rays keep their screen-swizzled coherence.
    # 0 = off.  Takes precedence over compact_after.
    compact_every: int = 0
    # With compact_every > 0: between windows, additionally SORT the alive
    # prefix by (coarse origin cell, direction octant, fine origin Morton)
    # instead of the stable alive-first partition.  Scattered bounce rays
    # then regroup into tiles sharing a spatial patch AND a direction cone,
    # collapsing each tile's union-of-work — the lever for LARGE streamed
    # scenes where per-segment lane utilization is otherwise ~0.2%.
    compact_octants: bool = False
    # Let integrate() choose compaction automatically: scenes with >= 64k
    # triangles (deep into HBM streaming) get compact_every=2 + octant sort
    # (measured 1.67x at 124k tris); smaller scenes run the monolithic
    # kernel (compaction measured a loss there).  Explicit compact_every /
    # compact_after settings override.  Set False to always run monolithic.
    compact_auto: bool = True
    # engine='mega' only: visit the megakernel's top-level triangle boxes
    # (SUPER_T supers in VMEM, SEG_T segments when streaming) in this many
    # front-to-back DISTANCE SHELLS around each ray tile's origin centroid
    # instead of table order.  Nearby geometry then tightens best_t in the
    # first shell and far boxes fail the slab test's `near < best_t` for
    # every lane — skipping their math and, when streaming, their DMA.
    # Pure visit reordering: results are unchanged (up to exact-t ties of
    # duplicated prims).  0 = off.
    mega_f2b_shells: int = 0
    # engine='mega', HBM-streamed scenes (> 8k triangles) only: run the
    # triangle sweep on the MXU — per sublane row, ONE
    # (4T, 10) @ (10, 128) matmul computes every Moller-Trumbore
    # determinant of a 256-triangle super against the row's 128 rays
    # (docs/experiments/mxu_determinants.py measured 1.85x the VPU sweep
    # in isolation).  MEASURED NEGATIVE end-to-end: trading away chunk-level
    # best-t pruning inside visited supers costs more than the matmul rate
    # buys — ~2.8x SLOWER than the VPU sweep on the 124k-tri path-8 field
    # (docs/ROUND2_NOTES.md "MXU sweep INTEGRATED").  Kept as a working,
    # tested example of in-kernel MXU determinant evaluation; leave False
    # for production.  Requires tables from build_mega_tables(..., mxu=True).
    mega_mxu: bool = False
    # engine='mega_diff' only: replay-based backward.  The fused forward also
    # records each bounce's winning primitive id (one extra output plane per
    # bounce); the custom VJP then differentiates a REPLAY of the bounce loop
    # that gathers each stored winner and recomputes only its continuous
    # quantities (ops/intersect.replay_hits) — O(rays x depth) instead of the
    # full wavefront re-sweep (O(rays x depth x prims)).  Gradients are the
    # same detached-discrete / attached-continuous estimator: the discrete
    # argmin is piecewise-constant, so fixing the winner indices changes
    # nothing where the two engines agree on winners (fp-marginal lanes may
    # pick different — equally valid — subgradients).  False restores the
    # round-2 behavior (full wavefront backward).
    mega_replay_bwd: bool = True
    # Mesh axis names to all-reduce scene-parameter GRADIENTS over, applied
    # PER BOUNCE inside the backward scan (an identity whose cotangent is
    # pmean'd).  Each bounce's contribution reduces while the next bounce's
    # backward computes — the bucketed-overlap form of the post-hoc grad
    # pmean (SURVEY.md §7 hard part 4).  Only meaningful under shard_map;
    # callers using it must NOT pmean the grads again afterwards.
    grad_sync_axes: Tuple[str, ...] = ()

    def __post_init__(self):
        if self.integrator not in INTEGRATORS:
            raise ValueError(f"integrator must be one of {INTEGRATORS}")
        if self.engine not in ("wavefront", "mega", "mega_diff"):
            raise ValueError(
                "engine must be 'wavefront', 'mega', or 'mega_diff'")
        if self.samples < 1 or self.width < 1 or self.height < 1:
            raise ValueError(
                f"width/height/samples must be >= 1; got {self.width}x"
                f"{self.height} samples={self.samples}")
        if self.max_depth < 0:
            raise ValueError(f"max_depth must be >= 0; got {self.max_depth}")

    @property
    def aspect(self) -> float:
        return float(self.width) / float(self.height)

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.height, self.width)
