"""Shading integrators — the reference's recursive shaders re-expressed as
fixed-depth ``lax.scan`` with alive-masking.

The reference ships three integrators, selected by (un)commenting
render.h:119-121:

  shade        (render.h:48-67)  — recursive path tracer: at a hit, radiance =
               emitted + attenuation * shade(scattered, depth-1); on scatter
               failure or depth exhaustion, emitted + vec3(0.1); on miss,
               backgroundSky(dir).  Recursion depth 8 needs a 16KB device stack
               (kernel.cu:48,67).  Here the recursion is a scan of
               max_depth + 1 steps carrying (rays, throughput, radiance,
               alive) — no stack, fully differentiable, and XLA unrolls the
               short scan into straight-line fused code.
  LambertShade (render.h:70-87)  — the ACTIVE integrator: single intersect,
               attenuation * max(dot(dir, normal), 0) * sky(dir) * 0.2 +
               emitted (with the UNNORMALIZED camera-ray direction).
  shade_normal (render.h:90-103) — normal visualization.

Differentiability: the discrete hit choice (argmin over primitives) is
piecewise-constant — gradients flow through the continuous quantities (t, p,
normal, attenuation) for the *selected* primitive, which is the standard
detached-discrete / attached-continuous estimator; random draws are
reparameterized (keys independent of scene parameters).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core import vec as v3
from ..core.rays import Rays
from ..models import materials as _mat
from ..models.scene import Scene
from . import intersect as _isect

Array = jnp.ndarray


class SampleStream(NamedTuple):
    """Injected per-(ray, bounce) scatter samples — the deterministic
    cross-renderer parity mode (SURVEY.md §7 hard part 3, BASELINE.md
    acceptance gate).  When passed to an integrator, every stochastic draw is
    read from these arrays instead of the threefry key, so the jnp, BVH,
    Pallas-sweep, and megakernel paths (and the float64 oracle) consume an
    IDENTICAL sample sequence."""

    ball: Array   # f32[max_depth+1, N, 3] unit-ball sample per bounce step
    prob: Array   # f32[max_depth+1, N]    uniform draw per bounce step


def stream_from_key(key: jax.Array, n: int, max_depth: int) -> SampleStream:
    """The exact stream trace_path would draw internally from `key` — step i
    uses fold_in(key, i) then scatter_draws.  Rendering with
    samples=stream_from_key(key, ...) is bit-identical to rendering with
    `key` alone."""
    balls, probs = [], []
    for step in range(max_depth + 1):
        b, p = _mat.scatter_draws(jax.random.fold_in(key, step), n)
        balls.append(b)
        probs.append(p)
    return SampleStream(jnp.stack(balls), jnp.stack(probs))


def background_sky(direction: Array) -> Array:
    """render.h:41-46 — vertical gradient white -> (0.5, 0.7, 1.0)."""
    unit = v3.unit_vector(direction)
    t = 0.5 * (unit[..., 1] + 1.0)
    return v3.lerp(t, jnp.ones_like(direction),
                   jnp.broadcast_to(jnp.asarray([0.5, 0.7, 1.0]), direction.shape))


def _split_fns(intersect_fn):
    """intersect_fn may be a single callable or a (primary_fn, bounce_fn)
    pair (see ops.render.pallas_intersector_pair): the primary fn serves the
    coherent camera pass, the bounce fn the incoherent later bounces."""
    if isinstance(intersect_fn, tuple):
        return intersect_fn
    return intersect_fn, intersect_fn


def _pmean_cotangent_tree(tree, axis_names):
    """Identity on the forward pass; pmean's the COTANGENT over axis_names on
    the backward pass.  Applied to the scene once per bounce, this turns the
    single post-hoc gradient all-reduce into per-bounce buckets that the
    backward scan overlaps with compute (SURVEY.md §7 hard part 4).  Linear,
    so sum-over-bounces of pmean'd buckets == pmean of the summed gradient."""

    @jax.custom_vjp
    def ident(leaves):
        return leaves

    def fwd(leaves):
        return leaves, None

    def bwd(_, g):
        return (jax.tree.map(
            lambda x: functools.reduce(
                lambda a, ax: jax.lax.pmean(a, ax), axis_names, x), g),)

    ident.defvjp(fwd, bwd)

    leaves, treedef = jax.tree.flatten(tree)
    inexact = [jnp.issubdtype(x.dtype, jnp.inexact) for x in leaves]
    synced = ident(tuple(x for x, f in zip(leaves, inexact) if f))
    it = iter(synced)
    out = [next(it) if f else x for x, f in zip(leaves, inexact)]
    return jax.tree.unflatten(treedef, out)


def _accepts_alive(fn) -> bool:
    """Does this intersect_fn take the optional alive-mask kwarg?  Sniffed
    by signature (trace-time only) so 3-arg custom intersectors keep
    working unchanged."""
    import inspect
    try:
        return "alive" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


def _intersect(scene: Scene, rays: Rays, cfg: RenderConfig, intersect_fn=None,
               aux=None, alive=None):
    """intersect_fn(scene, rays, aux) lets callers swap the brute-force path
    for BVH traversal (aux = FlatBVH pytree) or a Pallas kernel; aux flows as
    a traced operand so per-frame updates don't retrigger compilation.

    alive: optional mask forwarded to intersectors that accept it (the
    Pallas sweeps skip fully dead ray tiles); others ignore it — dead
    lanes' hits are masked out downstream either way."""
    if intersect_fn is not None:
        if alive is not None and _accepts_alive(intersect_fn):
            return intersect_fn(scene, rays, aux, alive=alive)
        return intersect_fn(scene, rays, aux)
    return _isect.intersect_scene(scene, rays, cfg.t_min, cfg.t_max, cfg.quirks)


def trace_path(scene: Scene, rays: Rays, key: jax.Array, cfg: RenderConfig,
               intersect_fn=None, aux=None,
               samples: Optional[SampleStream] = None,
               winners: Optional[Array] = None,
               return_winners: bool = False):
    """shade() as a wavefront scan. Returns radiance f32[N,3].

    Step i corresponds to the recursive call at depth = max_depth - i; the
    final step (depth 0) can no longer scatter (render.h:57 `depth > 0`), so
    after max_depth+1 steps every lane has terminated.

    samples: optional injected SampleStream replacing every key-derived draw
    (deterministic cross-renderer parity mode).

    winners: optional i32[max_depth + 1, N] pre-recorded per-bounce winning
    primitive ids (Hits.prim space, -1 = miss).  REPLAY mode: intersection
    is replaced by ops/intersect.replay_hits — gather each stored winner and
    recompute only its continuous quantities — which is what makes the
    megakernel's replay backward O(rays x depth).  intersect_fn is ignored.

    return_winners: also return that winners array as recorded by THIS
    render (i32[max_depth + 1, N]) — the recording half of replay mode, and
    the ground-truth oracle for testing replays.
    """
    n = rays.origin.shape[0]
    throughput0 = jnp.ones((n, 3), jnp.float32)
    radiance0 = jnp.zeros((n, 3), jnp.float32)
    alive0 = jnp.ones((n,), bool)
    ambient = jnp.float32(cfg.quirks.ambient_on_absorb)
    primary_fn, bounce_fn = _split_fns(intersect_fn)
    # Sphere-block Morton permutation (cfg.wavefront_sphere_cull='morton',
    # advertised by the built-in Pallas intersectors — custom intersect_fns
    # with their own aux keep builder order): permute center/radius/mat ONCE
    # so every sweep, finalize gather, and shade runs consistently in sorted
    # space.  Spatially compact chunks make the every-bounce chunk-box
    # culling fire (the megakernel's recipe, build_mega_tables) at ZERO
    # per-ray cost — remapping winner ids per bounce instead measured
    # +2.2 s/frame at headline scale (docs/ROUND4_NOTES.md §12).  Values
    # identical up to exact-t ties (winner follows Morton order there, the
    # same caveat the mega tables carry).  Skipped in replay mode: winners
    # are recorded in SCENE space and replay_hits does no sweeps at all.
    sphere_order = tri_order = None
    if (winners is None and getattr(bounce_fn, "morton_spheres", False)):
        from . import pallas_intersect as _pk
        if scene.n_spheres > _pk.PRIM_CHUNK:
            sphere_order = _pk.morton_argsort(scene.spheres.center)
            sp = scene.spheres
            scene = scene._replace(spheres=sp._replace(
                center=sp.center[sphere_order],
                radius=sp.radius[sphere_order],
                mat=sp.mat[sphere_order]))
        # triangles too: the tri sweeps cull on every bounce already, but
        # builder/OBJ order leaves chunk boxes loose; Morton-compact
        # centroids tighten them (same zero-remap trick, same tie caveat)
        if scene.n_triangles > _pk.PRIM_CHUNK:
            tr = scene.triangles
            tri_order = _pk.morton_argsort((tr.v0 + tr.v1 + tr.v2) / 3.0)
            scene = scene._replace(triangles=tr._replace(
                v0=tr.v0[tri_order], v1=tr.v1[tri_order],
                v2=tr.v2[tri_order], normal=tr.normal[tri_order],
                mat=tr.mat[tri_order]))
    # alive-first inter-bounce partition (cfg.wavefront_compact): dead
    # lanes collapse into tail tiles the alive-masked Pallas sweeps skip
    # wholesale.  Pure permutation — the injected stream is gathered into
    # the current arrangement per bounce and the radiance unscrambles by
    # one final scatter.  Replay/recording runs keep original order (the
    # winners arrays are position-indexed).
    compact = bool(cfg.wavefront_compact) and winners is None \
        and not return_winners

    def make_bounce(isect_fn, use_alive=True):
        # use_alive=False for the unrolled primary step (all lanes alive —
        # an alive input there would only add a pointless kernel operand)
        def bounce(carry, xs):
            return _bounce_body(carry, xs, isect_fn, use_alive)
        return bounce

    def _step_xs(step):
        xs = [jnp.int32(step)]
        if samples is not None:
            xs += [samples.ball[step], samples.prob[step]]
        if winners is not None:
            xs.append(winners[step])
        return tuple(xs) if len(xs) > 1 else xs[0]

    def _scan_xs(lo, hi):
        xs = [jnp.arange(lo, hi)]
        if samples is not None:
            xs += [samples.ball[lo:hi], samples.prob[lo:hi]]
        if winners is not None:
            xs.append(winners[lo:hi])
        return tuple(xs) if len(xs) > 1 else xs[0]

    def _bounce_body(carry, xs, isect_fn, use_alive=True):
        ball = prob = win = None
        if isinstance(xs, tuple):
            it = iter(xs)
            step = next(it)
            if samples is not None:
                ball, prob = next(it), next(it)
            if winners is not None:
                win = next(it)
        else:
            step = xs
        if compact:
            rays, throughput, radiance, alive, idx = carry
            if ball is not None:     # stream planes ride the permutation
                ball, prob = ball[idx], prob[idx]
        else:
            rays, throughput, radiance, alive = carry
        bounce_key = jax.random.fold_in(key, step)
        if (ball is None and cfg.wavefront_tpu_prng
                and jax.default_backend() == "tpu"):
            # TPU forward draws from the hardware PRNG (ROUND5_NOTES §10);
            # injected streams and CPU keep threefry (scatter() draws
            # internally from bounce_key below when ball stays None)
            from . import pallas_intersect as _pk
            ball, prob = _pk.scatter_draws_pallas(
                bounce_key, rays.origin.shape[0])
        # per-bounce gradient bucketing: this bounce's scene-parameter
        # cotangents all-reduce during ITS backward step, overlapping with
        # the neighbouring bounces' backward compute
        bscene = (_pmean_cotangent_tree(scene, cfg.grad_sync_axes)
                  if cfg.grad_sync_axes else scene)
        if win is not None:
            hits = _isect.replay_hits(bscene, rays, win, cfg.t_min,
                                      cfg.t_max, cfg.quirks)
        else:
            hits = _intersect(bscene, rays, cfg, isect_fn, aux,
                              alive=alive if use_alive else None)

        # one material/texture row gather serves emitted AND scatter; when
        # finalize could fold the decode columns into its winner-row gather
        # (hits.dec, TPU consolidated form on sphere/tri-only scenes) the
        # bounce pays NO separate decode gather at all
        dec = hits.dec
        if dec is None:
            dec = _mat.decode_materials(bscene.materials, bscene.textures,
                                        hits.mat)
        emitted = _mat.emitted(bscene.materials, bscene.textures, hits.mat,
                               hits.u, hits.v, hits.p, dec=dec)
        sc = _mat.scatter(bscene.materials, bscene.textures, hits.mat, rays,
                          hits.p, hits.normal, hits.u, hits.v, bounce_key,
                          cfg.quirks.dielectric_reference_cosine,
                          ball=ball, prob=prob,
                          lambertian_zero_uv=cfg.quirks.lambertian_zero_uv,
                          dec=dec)
        sky = background_sky(rays.direction)

        can_recurse = step < cfg.max_depth          # render.h:57 depth > 0
        continues = alive & hits.hit & sc.ok & can_recurse
        absorbed = alive & hits.hit & ~(sc.ok & can_recurse)
        missed = alive & ~hits.hit

        contrib = jnp.where(alive[..., None] & hits.hit[..., None], emitted, 0.0)
        contrib += jnp.where(absorbed[..., None], ambient, 0.0)   # render.h:61
        contrib += jnp.where(missed[..., None], sky, 0.0)          # render.h:64
        radiance = radiance + throughput * contrib

        throughput = jnp.where(continues[..., None],
                               throughput * sc.attenuation, throughput)
        new_rays = Rays(
            jnp.where(continues[..., None], sc.scattered.origin, rays.origin),
            jnp.where(continues[..., None], sc.scattered.direction, rays.direction),
            jnp.where(continues, sc.scattered.time, rays.time))
        ys = (jnp.where(alive & hits.hit, hits.prim, -1) if return_winners
              else None)
        if compact:
            from .megakernel import _partition_alive_first
            order = _partition_alive_first(continues)
            new_rays = Rays(new_rays.origin[order],
                            new_rays.direction[order], new_rays.time[order])
            return (new_rays, throughput[order], radiance[order],
                    continues[order], idx[order]), ys
        return (new_rays, throughput, radiance, continues), ys

    carry = (rays, throughput0, radiance0, alive0)
    if compact:
        carry = carry + (jnp.arange(n, dtype=jnp.int32),)
    # Each bounce body is jax.checkpoint'ed: reverse-mode rematerializes per
    # bounce instead of storing rays x depth intermediates (SURVEY.md §7 hard
    # part 1 "memory-aware backward").  When a (primary, bounce) intersect
    # pair is supplied, the first bounce (coherent camera rays) runs unrolled
    # with primary_fn and the rest scan with bounce_fn; with a single fn the
    # whole depth stays in one scan (smaller program, same math).
    if primary_fn is bounce_fn:
        carry, ys = jax.lax.scan(jax.checkpoint(make_bounce(bounce_fn)), carry,
                                 _scan_xs(0, cfg.max_depth + 1))
    else:
        carry, y0 = jax.checkpoint(make_bounce(primary_fn, use_alive=False))(
            carry, _step_xs(0))
        ys = y0[None] if return_winners else None
        if cfg.max_depth >= 1:
            carry, ys1 = jax.lax.scan(jax.checkpoint(make_bounce(bounce_fn)),
                                      carry, _scan_xs(1, cfg.max_depth + 1))
            if return_winners:
                ys = jnp.concatenate([ys, ys1])
    radiance = carry[2]
    if compact:   # unscramble: one scatter (near-serial on TPU — pay once)
        radiance = jnp.zeros_like(radiance).at[carry[4]].set(radiance)
    if return_winners:
        if sphere_order is not None or tri_order is not None:
            # recorded winners leave in SCENE (builder) space: sphere/tri
            # ids map back through their permutations, everything else
            # (rect/TRS offsets, -1 misses) is untouched.  One small
            # gather per recorded render — never paid by plain rendering.
            n_s, n_t = scene.n_spheres, scene.n_triangles
            if sphere_order is not None:
                ys = jnp.where((ys >= 0) & (ys < n_s),
                               sphere_order[jnp.clip(ys, 0, n_s - 1)], ys)
            if tri_order is not None:
                in_t = (ys >= n_s) & (ys < n_s + n_t)
                ys = jnp.where(
                    in_t,
                    n_s + tri_order[jnp.clip(ys - n_s, 0, n_t - 1)], ys)
        return radiance, ys
    return radiance


def lambert_shade(scene: Scene, rays: Rays, key: jax.Array, cfg: RenderConfig,
                  intersect_fn=None, aux=None) -> Array:
    """LambertShade (render.h:70-87), the reference's active integrator."""
    hits = _intersect(scene, rays, cfg, _split_fns(intersect_fn)[0], aux)
    dec = hits.dec
    if dec is None:
        dec = _mat.decode_materials(scene.materials, scene.textures, hits.mat)
    emitted = _mat.emitted(scene.materials, scene.textures, hits.mat,
                           hits.u, hits.v, hits.p, dec=dec)
    sc = _mat.scatter(scene.materials, scene.textures, hits.mat, rays,
                      hits.p, hits.normal, hits.u, hits.v, key,
                      cfg.quirks.dielectric_reference_cosine,
                      lambertian_zero_uv=cfg.quirks.lambertian_zero_uv,
                      dec=dec)
    direction = rays.direction if cfg.quirks.lambert_unnormalized_dot \
        else v3.unit_vector(rays.direction)
    t = jnp.maximum(v3.dot(direction, hits.normal), 0.0)      # render.h:80-81
    sky = background_sky(rays.direction)
    lit = sc.attenuation * t[..., None] * sky * 0.2 + emitted  # render.h:82
    return jnp.where(hits.hit[..., None], lit, sky)


def shade_normal(scene: Scene, rays: Rays, key: jax.Array, cfg: RenderConfig,
                 intersect_fn=None, aux=None) -> Array:
    """shade_normal (render.h:90-103) — raw normals as color."""
    hits = _intersect(scene, rays, cfg, _split_fns(intersect_fn)[0], aux)
    sky = background_sky(rays.direction)
    return jnp.where(hits.hit[..., None], hits.normal, sky)


INTEGRATOR_FNS = {
    "path": trace_path,
    "lambert": lambert_shade,
    "normal": shade_normal,
}


def integrate(scene: Scene, rays: Rays, key: jax.Array, cfg: RenderConfig,
              intersect_fn=None, aux=None,
              samples: Optional[SampleStream] = None) -> Array:
    if cfg.engine in ("mega", "mega_diff"):
        from . import megakernel as _mk   # local: pallas optional
        # mega_diff only has a differentiable pairing for the path
        # integrator; lambert/normal fall through to the (differentiable)
        # wavefront integrators rather than the forward-only fused kernel.
        use_mega = _mk.megakernel_supported(scene) and not (
            cfg.engine == "mega_diff" and cfg.integrator != "path")
        # the 'normal' integrator never reads textures, so image-texture
        # scenes run the plain fused kernel (mega_tex_supported == the
        # megakernel gate minus the image restriction)
        if (not use_mega and cfg.integrator == "normal"
                and cfg.engine == "mega" and _mk.mega_tex_supported(scene)):
            use_mega = True
        if use_mega:
            tables = aux if isinstance(aux, _mk.MegaTables) else None
            if cfg.engine == "mega_diff":
                return _mk.trace_path_mega_diff(scene, rays, key, cfg,
                                                samples=samples,
                                                tables=tables)
            return _mk.select_mega(scene, rays, key, cfg, tables, samples)
        if (cfg.integrator in ("path", "lambert")
                and not _mk.megakernel_supported(scene)
                and _mk.mega_tex_supported(scene)
                and not (cfg.engine == "mega_diff"
                         and cfg.integrator != "path")):
            # image-texture scenes: fused want_tex kernel + deferred
            # texture pass (path: per-bounce planes; lambert: two
            # pseudo-steps); mega_diff pairs path with the replay backward
            tables = aux if isinstance(aux, _mk.MegaTables) else None
            fn = (_mk.trace_path_mega_tex_diff if cfg.engine == "mega_diff"
                  else _mk.trace_path_mega_tex)
            return fn(scene, rays, key, cfg, samples=samples, tables=tables)
        if isinstance(aux, _mk.MegaTables):   # fall back to wavefront
            aux = None
    if cfg.integrator == "path":
        return trace_path(scene, rays, key, cfg, intersect_fn, aux, samples)
    # lambert/normal discard the scatter direction, so the injected stream
    # cannot influence them; key-only is already deterministic there.
    return INTEGRATOR_FNS[cfg.integrator](scene, rays, key, cfg, intersect_fn,
                                          aux)
