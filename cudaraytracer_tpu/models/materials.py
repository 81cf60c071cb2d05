"""Material table + branch-free scatter/emit.

Replaces the virtual ``Material`` hierarchy (CudaTest/src/material/material.h)
with a SoA table and masked evaluation of all four material models, selected by
type id — the TPU equivalent of virtual dispatch.

Semantics reproduced exactly (file:line cites into the reference):
  LAMBERTIAN (material.h:55-72): target = p + n + unit_ball(); scattered =
      Ray(p, target - p, r_in.time); attenuation = albedo->value(0, 0, p)
      (note the hard-coded u=v=0); always scatters.
  METAL (material.h:75-96): reflected = reflect(unit(dir), n); scattered =
      Ray(p, reflected + fuzz*unit_ball()); attenuation = albedo; scatters iff
      dot(scattered.dir, n) > 0.  fuzz clamped to <= 1 at build.
  DIELECTRIC (material.h:99-143): attenuation = 1; Schlick-probability choice
      of reflect/refract, with the reference's nonstandard exit-side cosine
      sqrt(1 - ri^2 (1 - cos^2)) kept behind Quirks.dielectric_reference_cosine.
  DIFFUSE_LIGHT (material.h:146-161): never scatters; emitted = emit->value(u,v,p).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng as _rng
from ..core import vec as v3
from ..core.rays import Rays
from .textures import TextureBuilder, TextureTable

Array = jnp.ndarray

LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2
DIFFUSE_LIGHT = 3


class MaterialTable(NamedTuple):
    kind: Array     # int32[M]
    tex_id: Array   # int32[M]  albedo texture (lambertian) / emit texture (light)
    albedo: Array   # f32[M,3]  metal albedo color
    fuzz: Array     # f32[M]
    ref_idx: Array  # f32[M]


class ScatterResult(NamedTuple):
    ok: Array           # bool[N]  did the material scatter
    scattered: Rays     # next rays
    attenuation: Array  # f32[N,3]


class DecodedMaterials(NamedTuple):
    """Per-lane material + texture fields, decoded by ONE row gather.

    Separate small-table gathers measured 19x slower than a row gather on
    v5e (docs/experiments/gather_micro.py: 178 ms vs 9.5 ms at 4.15M
    indices), and the per-bounce material/texture decode — ~17 gather ops
    across emitted + scatter — was the dominant per-bounce glue of the
    wavefront engine and the mega_diff replay backward.  decode_materials
    packs the material table and its textures' fields into one (M, 16) f32
    table and gathers one row per lane; int fields round-trip exactly
    (values << 2^24).  Gradients to albedo/color0/color1 flow through the
    concat + gather (VJP: slice + scatter-add), identical in value to the
    separate-gather form."""

    kind: Array      # f32[N]   material kind (LAMBERTIAN..DIFFUSE_LIGHT)
    fuzz: Array      # f32[N]
    ref_idx: Array   # f32[N]
    albedo: Array    # f32[N,3] metal albedo color
    tex_kind: Array  # f32[N]
    c0: Array        # f32[N,3] constant color / checker even
    c1: Array        # f32[N,3] checker odd
    img: Array       # i32[N]   image row (0 = dummy)
    wh: Array        # i32[N,2] image (w, h)


def decode_materials(mat: MaterialTable, tex: TextureTable, mat_id: Array,
                     consolidate: bool | None = None) -> DecodedMaterials:
    """Per-lane material/texture decode, backend-specialized (both forms are
    value-identical; pinned by test_decode_materials_row_vs_field_forms).

    consolidate=True (default on TPU): ONE (M, 16) f32 row gather replaces
    the ~17 per-field gathers.  TPU gathers pay per OP (~3.5 ms/M-index),
    not per byte, at small-table scale (19x measured, docs/experiments/
    gather_micro.py) — the round-3 5.9x wavefront win.  A round-4 variant
    that split the static columns into a second int32 gather (narrower f32
    row, no VJP for int columns) measured 1.8x SLOWER on the TPU wavefront
    headline (9.0M -> 5.0M rays/s): the extra gather op costs more than
    the narrower scatter saves.  One op wins on TPU.

    consolidate=False (default on CPU): plain per-field gathers.  On
    XLA:CPU the consolidated form measured ~36% SLOWER grad steps — the
    backward scatters cotangent columns even for the int-derived fields
    and assembles the wide cotangent row in one kLoop add_any fusion
    (profiled: that single fusion carried the whole SCALING_r03 fit-step
    regression).  Gather cost models are opposite on the two backends, so
    the decode form follows the backend (a trace-time, value-neutral
    choice)."""
    if consolidate is None:
        consolidate = jax.default_backend() == "tpu"
    if not consolidate:
        tid = mat.tex_id[mat_id]
        img = tex.image_id[tid]
        return DecodedMaterials(
            kind=mat.kind[mat_id].astype(jnp.float32), fuzz=mat.fuzz[mat_id],
            ref_idx=mat.ref_idx[mat_id], albedo=mat.albedo[mat_id],
            tex_kind=tex.kind[tid].astype(jnp.float32), c0=tex.color0[tid],
            c1=tex.color1[tid], img=img, wh=tex.image_wh[img])
    row = decode_table(mat, tex)[mat_id]
    return decoded_from_rows(row)


DEC_COLS = 16      # decode_table row width (DecodedMaterials packed)


def decode_table(mat: MaterialTable, tex: TextureTable) -> Array:
    """The (M, 16) packed material/texture decode table of the consolidated
    form — also appended per-PRIM to ops/intersect._prim_rows so finalize
    and decode share ONE per-ray gather (the decode gather measured ~0.45 s
    of the r4 wavefront headline frame as a separate op)."""
    tid = mat.tex_id
    img = tex.image_id[tid]
    return jnp.concatenate([
        mat.kind.astype(jnp.float32)[:, None],
        mat.fuzz[:, None],
        mat.ref_idx[:, None],
        mat.albedo,
        tex.kind[tid].astype(jnp.float32)[:, None],
        tex.color0[tid],
        tex.color1[tid],
        img.astype(jnp.float32)[:, None],
        tex.image_wh[img].astype(jnp.float32),
    ], axis=1)                                   # (M, 16)


def decoded_from_rows(row: Array) -> DecodedMaterials:
    """Unpack gathered decode_table rows (..., 16) -> DecodedMaterials."""
    return DecodedMaterials(
        kind=row[..., 0], fuzz=row[..., 1], ref_idx=row[..., 2],
        albedo=row[..., 3:6], tex_kind=row[..., 6], c0=row[..., 7:10],
        c1=row[..., 10:13], img=row[..., 13].astype(jnp.int32),
        wh=row[..., 14:16].astype(jnp.int32))


def eval_texture_dec(dec: DecodedMaterials, tex: TextureTable, u: Array,
                     v: Array, p: Array) -> Array:
    """textures.eval_texture on pre-decoded rows — line-for-line the same
    math (texture.h:12-76), minus the per-field gathers."""
    import jax.numpy as _jnp
    from . import textures as _tx
    sines = (_jnp.sin(10.0 * p[..., 0]) * _jnp.sin(10.0 * p[..., 1])
             * _jnp.sin(10.0 * p[..., 2]))
    checker = _jnp.where((sines < 0.0)[..., None], dec.c1, dec.c0)
    out = _jnp.where((dec.tex_kind == float(_tx.CHECKER))[..., None],
                     checker, dec.c0)
    if tex.images.shape[0] == 1:
        # no image textures registered (row 0 is the builder's dummy, so
        # IMAGE kind cannot occur) — statically skip the per-lane texel
        # gather, which costs per INDEX even into the (1,1,1,3) dummy
        return out
    nx = dec.wh[..., 0].astype(_jnp.float32)
    ny = dec.wh[..., 1].astype(_jnp.float32)
    i = _jnp.clip((u * nx).astype(_jnp.int32), 0, dec.wh[..., 0] - 1)
    j = _jnp.clip(((1.0 - v) * ny - 0.001).astype(_jnp.int32), 0,
                  dec.wh[..., 1] - 1)
    texel = tex.images[dec.img, j, i].astype(_jnp.float32) / 255.0
    return _jnp.where((dec.tex_kind == float(_tx.IMAGE))[..., None],
                      texel, out)


def emitted(mat: MaterialTable, tex: TextureTable, mat_id: Array, u: Array,
            v: Array, p: Array,
            dec: DecodedMaterials | None = None) -> Array:
    """Material::emitted — nonzero only for DIFFUSE_LIGHT (material.h:153-155).

    dec: optional pre-decoded rows (decode_materials), shared with scatter
    so a bounce pays ONE row gather."""
    if dec is None:
        dec = decode_materials(mat, tex, mat_id)
    val = eval_texture_dec(dec, tex, u, v, p)
    is_light = dec.kind == float(DIFFUSE_LIGHT)
    return jnp.where(is_light[..., None], val, 0.0)


def scatter_draws(key: jax.Array, n: int):
    """The scatter step's random draws: one unit-ball sample + one uniform per
    ray.  Factored out so callers can inject the identical stream into other
    renderers (megakernel, oracle) for deterministic cross-renderer parity
    (SURVEY.md §7 hard part 3)."""
    k_ball, k_prob = jax.random.split(key)
    ball = _rng.random_in_unit_sphere(k_ball, (n,))
    prob = _rng.uniform(k_prob, (n,))
    return ball, prob


def scatter(mat: MaterialTable, tex: TextureTable, mat_id: Array, r_in: Rays,
            p: Array, normal: Array, u: Array, v: Array, key: jax.Array,
            dielectric_reference_cosine: bool = True,
            ball: Array | None = None, prob: Array | None = None,
            lambertian_zero_uv: bool = True,
            dec: DecodedMaterials | None = None) -> ScatterResult:
    """Branch-free scatter for a batch of hits.

    All four material models are evaluated with shared random draws and the
    result is selected by the material kind — no data-dependent control flow,
    so XLA fuses the whole thing into one elementwise pass over the ray batch.

    ball/prob: optional INJECTED samples (f32[N,3] unit-ball vector and f32[N]
    uniform) replacing the key-derived draws — the sample-sequence-injection
    mode used for deterministic cross-renderer comparison.

    dec: optional pre-decoded material rows (decode_materials), shared with
    emitted so a bounce pays ONE row gather for all material/texture fields.
    """
    n = mat_id.shape[0]
    if dec is None:
        dec = decode_materials(mat, tex, mat_id)
    kind = dec.kind
    if ball is None or prob is None:
        ball, prob = scatter_draws(key, n)

    d_in = r_in.direction

    # --- LAMBERTIAN (material.h:60-68) ---
    lam_dir = normal + ball  # (p + n + ball) - p
    # material.h:67 samples the texture at u = v = 0 (quirk; only IMAGE
    # textures ever read u/v); Quirks.fixed() uses the hit's real (u, v)
    if lambertian_zero_uv:
        lam_att = eval_texture_dec(dec, tex, jnp.zeros_like(u),
                                   jnp.zeros_like(v), p)
    else:
        lam_att = eval_texture_dec(dec, tex, u, v, p)

    # --- METAL (material.h:81-92) ---
    reflected = v3.reflect(v3.unit_vector(d_in), normal)
    fuzz = dec.fuzz[..., None]
    met_dir = reflected + fuzz * ball
    met_att = dec.albedo
    met_ok = v3.dot(met_dir, normal) > 0.0

    # --- DIELECTRIC (material.h:104-141) ---
    ri = dec.ref_idx
    d_dot_n = v3.dot(d_in, normal)
    d_len = v3.length(d_in)
    exiting = d_dot_n > 0.0
    outward_normal = jnp.where(exiting[..., None], -normal, normal)
    ni_over_nt = jnp.where(exiting, ri, 1.0 / ri)
    cos_plain = jnp.where(exiting, d_dot_n / d_len, -d_dot_n / d_len)
    if dielectric_reference_cosine:
        # material.h:116-117 — exit side uses sqrt(1 - ri^2 (1 - cos^2));
        # double-where for a NaN-free backward pass when the operand is <= 0.
        q = 1.0 - ri * ri * (1.0 - cos_plain * cos_plain)
        cos_exit = jnp.where(q > 0.0, jnp.sqrt(jnp.where(q > 0.0, q, 1.0)), 0.0)
        cosine = jnp.where(exiting, cos_exit, cos_plain)
    else:
        cosine = cos_plain
    refr_ok, refracted = v3.refract(d_in, outward_normal, ni_over_nt)
    reflect_prob = jnp.where(refr_ok, v3.schlick(cosine, ri), 1.0)
    die_reflected = v3.reflect(d_in, normal)  # material.h:107 (unnormalized dir)
    die_dir = jnp.where((prob < reflect_prob)[..., None], die_reflected, refracted)
    die_att = jnp.ones_like(met_att)

    # --- select by kind ---
    kindc = kind[..., None]
    out_dir = jnp.where(kindc == METAL, met_dir, lam_dir)
    out_dir = jnp.where(kindc == DIELECTRIC, die_dir, out_dir)
    att = jnp.where(kindc == METAL, met_att, lam_att)
    att = jnp.where(kindc == DIELECTRIC, die_att, att)
    ok = jnp.where(kind == METAL, met_ok, True)
    ok = jnp.where(kind == DIFFUSE_LIGHT, False, ok)

    # Scattered ray keeps r_in.time for lambertian (material.h:66); the metal /
    # dielectric constructors default time to 0 — irrelevant downstream (no
    # motion), so time is carried uniformly.
    scattered = Rays(p, out_dir, r_in.time)
    return ScatterResult(ok, scattered, att)


class MaterialBuilder:
    """Host-side accumulation mirroring the reference constructors."""

    def __init__(self, textures: TextureBuilder | None = None):
        self.textures = textures if textures is not None else TextureBuilder()
        self._kind = []
        self._tex = []
        self._albedo = []
        self._fuzz = []
        self._ref_idx = []

    def _add(self, kind, tex=0, albedo=(0, 0, 0), fuzz=0.0, ref_idx=1.0) -> int:
        self._kind.append(kind)
        self._tex.append(tex)
        self._albedo.append(np.asarray(albedo, np.float32))
        self._fuzz.append(float(fuzz))
        self._ref_idx.append(float(ref_idx))
        return len(self._kind) - 1

    def lambertian(self, tex_id: int | None = None, color=None) -> int:
        if tex_id is None:
            tex_id = self.textures.constant(color if color is not None else (0.5, 0.5, 0.5))
        return self._add(LAMBERTIAN, tex=tex_id)

    def metal(self, albedo, fuzz: float = 0.0) -> int:
        return self._add(METAL, albedo=albedo, fuzz=min(float(fuzz), 1.0))

    def dielectric(self, ref_idx: float) -> int:
        return self._add(DIELECTRIC, ref_idx=ref_idx)

    def diffuse_light(self, tex_id: int | None = None, color=None) -> int:
        if tex_id is None:
            tex_id = self.textures.constant(color if color is not None else (1.0, 1.0, 1.0))
        return self._add(DIFFUSE_LIGHT, tex=tex_id)

    def build(self) -> MaterialTable:
        m = max(len(self._kind), 1)
        kind = np.zeros(m, np.int32)
        tex = np.zeros(m, np.int32)
        albedo = np.zeros((m, 3), np.float32)
        fuzz = np.zeros(m, np.float32)
        ref_idx = np.ones(m, np.float32)
        if self._kind:
            kind[:] = self._kind
            tex[:] = self._tex
            albedo[:] = np.stack(self._albedo)
            fuzz[:] = self._fuzz
            ref_idx[:] = self._ref_idx
        return MaterialTable(jnp.asarray(kind), jnp.asarray(tex),
                             jnp.asarray(albedo), jnp.asarray(fuzz),
                             jnp.asarray(ref_idx))
