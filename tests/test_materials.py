"""Material scatter/emit and texture tests vs the oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models import materials as mats
from cudaraytracer_tpu.models.textures import TextureBuilder, eval_texture

import oracle


def _build(fn):
    b = mats.MaterialBuilder()
    ids = fn(b)
    return b.build(), b.textures.build(), ids


def test_metal_mirror_reflection():
    mat, tex, mid = _build(lambda b: b.metal((0.8, 0.6, 0.2), fuzz=0.0))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    p = jnp.asarray([[0.0, 0.0, 0.0]])
    r = make_rays(jnp.asarray([[0, 1, 0]], jnp.float32),
                  jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32))
    out = mats.scatter(mat, tex, jnp.asarray([mid]), r, p, n,
                       jnp.zeros(1), jnp.zeros(1), jax.random.key(0))
    assert bool(out.ok[0])
    # fuzz=0: exact mirror of the unit direction
    expect = oracle.reflect(oracle.unit(np.array([1.0, -1.0, 0.0])),
                            np.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(out.scattered.direction[0], expect, atol=1e-6)
    np.testing.assert_allclose(out.attenuation[0], [0.8, 0.6, 0.2], rtol=1e-6)


def test_metal_absorbs_below_surface():
    """material.h:92 — scatter fails if reflected dir goes under the surface."""
    mat, tex, mid = _build(lambda b: b.metal((1, 1, 1), fuzz=0.0))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    p = jnp.zeros((1, 3))
    # grazing ray whose mirror is parallel: dot == 0 -> not > 0 -> absorbed
    r = make_rays(jnp.asarray([[0, 0, 0]], jnp.float32),
                  jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32))
    out = mats.scatter(mat, tex, jnp.asarray([mid]), r, p, n,
                       jnp.zeros(1), jnp.zeros(1), jax.random.key(0))
    assert not bool(out.ok[0])


def test_dielectric_entering_refracts():
    """Normal-incidence entry: refraction direction straight through;
    Schlick reflect_prob ~ 4% so most draws refract."""
    mat, tex, mid = _build(lambda b: b.dielectric(1.5))
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    p = jnp.zeros((1, 3))
    r = make_rays(jnp.asarray([[0, 0, 1]], jnp.float32),
                  jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32))
    hits_refract = 0
    for s in range(20):
        out = mats.scatter(mat, tex, jnp.asarray([mid]), r, p, n,
                           jnp.zeros(1), jnp.zeros(1), jax.random.key(s))
        assert bool(out.ok[0])
        np.testing.assert_allclose(out.attenuation[0], [1, 1, 1], atol=1e-6)
        d = np.asarray(out.scattered.direction[0])
        if d[2] < 0:  # refracted (continues through)
            hits_refract += 1
            np.testing.assert_allclose(d, [0, 0, -1], atol=1e-5)
    assert hits_refract >= 15  # E[refract] = 96%


def test_dielectric_total_internal_reflection():
    """Inside glass at a grazing angle: refract impossible -> always reflect."""
    mat, tex, mid = _build(lambda b: b.dielectric(1.5))
    # Exiting: dir has positive dot with outward normal (0,0,1)
    d = np.array([1.0, 0.0, 0.25])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    p = jnp.zeros((1, 3))
    r = make_rays(jnp.zeros((1, 3), jnp.float32), jnp.asarray([d], jnp.float32))
    ok_o, _ = oracle.refract(d, -np.array([0, 0, 1.0]), 1.5)
    assert not ok_o  # sanity: TIR case
    for s in range(5):
        out = mats.scatter(mat, tex, jnp.asarray([mid]), r, p, n,
                           jnp.zeros(1), jnp.zeros(1), jax.random.key(s))
        expect = oracle.reflect(d, np.array([0, 0, 1.0]))
        np.testing.assert_allclose(out.scattered.direction[0], expect, atol=1e-5)


def test_lambertian_scatter_distribution():
    mat, tex, mid = _build(lambda b: b.lambertian(color=(0.3, 0.6, 0.9)))
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (512, 3))
    p = jnp.zeros((512, 3))
    r = make_rays(jnp.zeros((512, 3), jnp.float32),
                  jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (512, 3)))
    out = mats.scatter(mat, tex, jnp.full((512,), mid), r, p, n,
                       jnp.zeros(512), jnp.zeros(512), jax.random.key(1))
    assert bool(out.ok.all())
    d = np.asarray(out.scattered.direction)
    # direction = normal + unit_ball: mean ~ normal, all within |n|+1
    assert np.linalg.norm(d.mean(0) - [0, 1, 0]) < 0.1
    assert (np.linalg.norm(d - [0, 1, 0], axis=-1) <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(out.attenuation, np.tile([0.3, 0.6, 0.9], (512, 1)),
                               rtol=1e-6)


def test_diffuse_light_emits_no_scatter():
    mat, tex, mid = _build(lambda b: b.diffuse_light(color=(4, 3, 2)))
    ids = jnp.asarray([mid])
    e = mats.emitted(mat, tex, ids, jnp.zeros(1), jnp.zeros(1), jnp.zeros((1, 3)))
    np.testing.assert_allclose(e[0], [4, 3, 2], rtol=1e-6)
    r = make_rays(jnp.zeros((1, 3), jnp.float32), jnp.ones((1, 3), jnp.float32))
    out = mats.scatter(mat, tex, ids, r, jnp.zeros((1, 3)),
                       jnp.asarray([[0.0, 1.0, 0.0]]), jnp.zeros(1), jnp.zeros(1),
                       jax.random.key(0))
    assert not bool(out.ok[0])


def test_lambertian_emits_zero():
    mat, tex, mid = _build(lambda b: b.lambertian(color=(1, 1, 1)))
    e = mats.emitted(mat, tex, jnp.asarray([mid]), jnp.zeros(1), jnp.zeros(1),
                     jnp.zeros((1, 3)))
    np.testing.assert_allclose(e[0], [0, 0, 0], atol=1e-7)


def test_checker_texture():
    tb = TextureBuilder()
    tid = tb.checker((1, 1, 1), (0, 0, 0))
    tex = tb.build()
    # texture.h:30-38: sines = sin(10x) sin(10y) sin(10z); < 0 -> odd
    p = jnp.asarray([[0.05, 0.05, 0.05],    # all sines > 0 -> even (white)
                     [0.05, 0.05, -0.05]])  # one negative -> odd (black)
    out = eval_texture(tex, jnp.asarray([tid, tid]), jnp.zeros(2), jnp.zeros(2), p)
    np.testing.assert_allclose(out[0], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 0], atol=1e-6)


def test_image_texture():
    tb = TextureBuilder()
    img = np.zeros((2, 4, 3), np.uint8)
    img[0, 0] = (255, 0, 0)    # top-left
    img[1, 3] = (0, 0, 255)    # bottom-right
    tid = tb.image(img)
    tex = tb.build()
    ids = jnp.asarray([tid, tid])
    # texture.h:65-76: i = u*nx, j = (1-v)*ny - 0.001
    u = jnp.asarray([0.0, 0.99])
    v = jnp.asarray([0.99, 0.0])
    out = eval_texture(tex, ids, u, v, jnp.zeros((2, 3)))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 1], atol=1e-6)


def test_decoded_materials_match_per_field_eval():
    """decode_materials + eval_texture_dec must be value-identical to the
    per-field eval_texture path (the row gather packs the same f32 values)
    for constant, checker, AND image textures across all material kinds."""
    import jax
    from cudaraytracer_tpu.models import materials as mats

    tb = TextureBuilder()
    t_const = tb.constant((0.2, 0.4, 0.6))
    t_chk = tb.checker((0.9, 0.9, 0.9), (0.1, 0.2, 0.1))
    t_img = tb.image((np.arange(60) * 9 % 256).astype(np.uint8
                                                      ).reshape(4, 5, 3))
    mb = mats.MaterialBuilder(tb)
    ids = [mb.lambertian(tex_id=t_const), mb.lambertian(tex_id=t_chk),
           mb.lambertian(tex_id=t_img), mb.metal((0.8, 0.7, 0.3), 0.2),
           mb.dielectric(1.5), mb.diffuse_light(tex_id=t_img)]
    mat = mb.build()
    tex = tb.build()
    n = 64
    rng = np.random.default_rng(3)
    mat_id = jnp.asarray(rng.integers(0, len(ids), n), jnp.int32)
    u = jnp.asarray(rng.uniform(size=n), jnp.float32)
    v = jnp.asarray(rng.uniform(size=n), jnp.float32)
    p = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    dec = mats.decode_materials(mat, tex, mat_id)
    got = np.asarray(mats.eval_texture_dec(dec, tex, u, v, p))
    ref = np.asarray(eval_texture(tex, mat.tex_id[mat_id], u, v, p))
    np.testing.assert_array_equal(got, ref)

    # decoded scalar fields round-trip exactly
    np.testing.assert_array_equal(np.asarray(dec.kind),
                                  np.asarray(mat.kind[mat_id], np.float32))
    np.testing.assert_array_equal(np.asarray(dec.fuzz),
                                  np.asarray(mat.fuzz[mat_id]))
    np.testing.assert_array_equal(np.asarray(dec.albedo),
                                  np.asarray(mat.albedo[mat_id]))

    # emitted with/without a shared decode agree exactly
    e1 = np.asarray(mats.emitted(mat, tex, mat_id, u, v, p))
    e2 = np.asarray(mats.emitted(mat, tex, mat_id, u, v, p, dec=dec))
    np.testing.assert_array_equal(e1, e2)


def test_decode_materials_row_vs_field_forms():
    """The backend-specialized decode forms (consolidate=True row gathers vs
    consolidate=False per-field gathers) are value-IDENTICAL on every field
    — the trace-time backend choice must be invisible (SCALING_r03 fix)."""
    from cudaraytracer_tpu.models import materials as mats

    tb = TextureBuilder()
    t_const = tb.constant((0.2, 0.4, 0.6))
    t_chk = tb.checker((0.9, 0.9, 0.9), (0.1, 0.2, 0.1))
    t_img = tb.image((np.arange(60) * 9 % 256).astype(np.uint8
                                                      ).reshape(4, 5, 3))
    mb = mats.MaterialBuilder(tb)
    ids = [mb.lambertian(tex_id=t_const), mb.lambertian(tex_id=t_chk),
           mb.lambertian(tex_id=t_img), mb.metal((0.8, 0.7, 0.3), 0.2),
           mb.dielectric(1.5), mb.diffuse_light(tex_id=t_img)]
    mat = mb.build()
    tex = tb.build()
    rng = np.random.default_rng(11)
    mat_id = jnp.asarray(rng.integers(0, len(ids), 97), jnp.int32)
    row = mats.decode_materials(mat, tex, mat_id, consolidate=True)
    fld = mats.decode_materials(mat, tex, mat_id, consolidate=False)
    for name in row._fields:
        np.testing.assert_array_equal(np.asarray(getattr(row, name)),
                                      np.asarray(getattr(fld, name)), name)
