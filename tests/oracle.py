"""Pure-NumPy float64 oracle mirroring the reference renderer's semantics.

Implements the deterministic parts of CudaTest/src (sphere.h / triangle.h /
rectangle.h intersections, hitable_list.h closest-hit scan, material.h scatter
for deterministic materials, render.h shade/LambertShade/backgroundSky,
camera.h) as straightforward scalar code, used to golden-test the vectorized
JAX implementation.  Stochastic draws (unit-ball samples, Schlick coin flips)
are delegated to an injectable sampler so tests can pin them.
"""

from __future__ import annotations

import math

import numpy as np

FLT_MAX = 3.4028235e38
TRI_EPS = 1e-6


def unit(v):
    return v / np.linalg.norm(v)


def background_sky(d):
    v = unit(np.asarray(d, np.float64))
    t = 0.5 * (v[1] + 1.0)
    return (1 - t) * np.ones(3) + t * np.array([0.5, 0.7, 1.0])


def reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


def refract(v, n, ni_over_nt):
    uv = unit(v)
    dt = np.dot(uv, n)
    disc = 1.0 - ni_over_nt ** 2 * (1.0 - dt * dt)
    if disc > 0:
        return True, ni_over_nt * (uv - n * dt) - n * math.sqrt(disc)
    return False, np.zeros(3)


def schlick(cosine, ref_idx):
    r0 = ((1 - ref_idx) / (1 + ref_idx)) ** 2
    return r0 + (1 - r0) * (1 - cosine) ** 5


# --- primitives -------------------------------------------------------------

class Sphere:
    def __init__(self, center, radius, mat):
        self.center = np.asarray(center, np.float64)
        self.radius = float(radius)
        self.mat = mat

    def hit(self, o, d, t_min, t_max):
        oc = o - self.center
        a = np.dot(d, d)
        b = np.dot(oc, d)
        c = np.dot(oc, oc) - self.radius ** 2
        disc = b * b - a * c
        if disc > 0:
            for tmp in [(-b - math.sqrt(disc)) / a, (-b + math.sqrt(disc)) / a]:
                if t_min < tmp < t_max:
                    p = o + tmp * d
                    return dict(t=tmp, p=p, normal=(p - self.center) / self.radius,
                                u=0.0, v=0.0, mat=self.mat)
        return None


class Triangle:
    """triangle.h:57-100 with quirks: backface-only + no t clamp."""

    def __init__(self, v0, v1, v2, normal, mat,
                 backface_only=True, no_t_clip=True, back_culling=False):
        self.v = [np.asarray(x, np.float64) for x in (v0, v1, v2)]
        self.normal = np.asarray(normal, np.float64)
        self.mat = mat
        self.backface_only = backface_only
        self.no_t_clip = no_t_clip
        self.back_culling = back_culling   # triangle.h ctor cull flag

    def hit(self, o, d, t_min, t_max):
        if self.backface_only and np.dot(d, self.normal) < 0:
            return None
        e1 = self.v[1] - self.v[0]
        e2 = self.v[2] - self.v[0]
        h = np.cross(d, e2)
        a = np.dot(e1, h)
        if a < TRI_EPS and self.back_culling:   # triangle.h:74
            return None
        if -TRI_EPS < a < TRI_EPS:              # triangle.h:77-78
            return None
        f = 1.0 / a
        s = o - self.v[0]
        u = f * np.dot(s, h)
        if u < 0 or u > 1:
            return None
        q = np.cross(s, e1)
        v = f * np.dot(d, q)
        if v < 0 or u + v > 1:
            return None
        t = f * np.dot(e2, q)
        if not self.no_t_clip and not (t_min < t < t_max):
            return None
        if self.no_t_clip and not (t < t_max):
            return None
        return dict(t=t, p=o + t * d, normal=self.normal, u=u, v=v, mat=self.mat)


def rotate(v, rotation_deg):
    """vec3.h:200-217 Euler rotate (degrees, NEGATED-Z quirk), float64."""
    v = np.asarray(v, np.float64)
    rx, ry, rz = np.asarray(rotation_deg, np.float64) * math.pi / 180.0
    rz = -rz   # vec3.h:206
    sx, cx = math.sin(rx), math.cos(rx)
    sy, cy = math.sin(ry), math.cos(ry)
    sz, cz = math.sin(rz), math.cos(rz)
    R = np.array([
        [cy * cz, -cy * sz, sy],
        [sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy],
        [-cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy]])
    return R @ v


def transform_ray(o, d, position, rotation, scale):
    """transform.h:11-14 TransformRay: ScaleRay (origin NOT scaled, direction
    normalized) -> RotateRay -> TranslateRay.  Returns (o', unit d')."""
    d2 = np.asarray(d, np.float64) / np.asarray(scale, np.float64)
    d2 = d2 / np.linalg.norm(d2)
    o2 = rotate(o, rotation)
    d2 = rotate(d2, rotation)
    return o2 - np.asarray(position, np.float64), d2


class TransformedSphere:
    """sphere.h through the full Hitable::hit chain (hitable.h:29-38):
    origin-centered object-space sphere; rec.p stays object-space, rec.normal
    (p/r) is rotated by the object rotation."""

    def __init__(self, position, rotation, scale, radius, mat):
        self.position = np.asarray(position, np.float64)
        self.rotation = np.asarray(rotation, np.float64)
        self.scale = np.asarray(scale, np.float64)
        self.radius = float(radius)
        self.mat = mat

    def hit(self, o, d, t_min, t_max):
        o2, d2 = transform_ray(o, d, self.position, self.rotation, self.scale)
        b = np.dot(o2, d2)
        c = np.dot(o2, o2) - self.radius ** 2
        disc = b * b - np.dot(d2, d2) * c
        if disc > 0:
            for tmp in [(-b - math.sqrt(disc)) / np.dot(d2, d2),
                        (-b + math.sqrt(disc)) / np.dot(d2, d2)]:
                if t_min < tmp < t_max:
                    p = o2 + tmp * d2
                    return dict(t=tmp, p=p,
                                normal=rotate(p / self.radius, self.rotation),
                                u=0.0, v=0.0, mat=self.mat)
        return None


class TransformedTriangle:
    """triangle.h through the Hitable::hit transform chain: object-space
    vertices, quirks on the TRANSFORMED ray, normal rotated."""

    def __init__(self, v0, v1, v2, normal, position, rotation, scale, mat,
                 backface_only=True, no_t_clip=True):
        self.inner = Triangle(v0, v1, v2, normal, mat,
                              backface_only=backface_only,
                              no_t_clip=no_t_clip)
        self.position = np.asarray(position, np.float64)
        self.rotation = np.asarray(rotation, np.float64)
        self.scale = np.asarray(scale, np.float64)

    def hit(self, o, d, t_min, t_max):
        o2, d2 = transform_ray(o, d, self.position, self.rotation, self.scale)
        rec = self.inner.hit(o2, d2, t_min, t_max)
        if rec is not None:
            rec["normal"] = rotate(rec["normal"], self.rotation)
        return rec


class HitList:
    """hitable_list.h:76-91 linear closest-hit scan."""

    def __init__(self, items):
        self.items = items

    def hit(self, o, d, t_min, t_max):
        closest = t_max
        rec = None
        for it in self.items:
            r = it.hit(o, d, t_min, closest)
            if r is not None and r["t"] < closest:
                closest = r["t"]
                rec = r
        return rec


# --- materials --------------------------------------------------------------

class Lambertian:
    def __init__(self, albedo):
        # albedo: RGB triple, or a callable p -> RGB (texture, e.g. checker)
        self.albedo = albedo if callable(albedo) else np.asarray(albedo, np.float64)

    def emitted(self, rec):
        return np.zeros(3)

    def scatter(self, o, d, rec, sampler):
        target_dir = rec["normal"] + sampler.unit_ball()
        att = (self.albedo(rec["p"]) if callable(self.albedo)
               else self.albedo.copy())
        return True, rec["p"], target_dir, att


def checker_texture(even, odd):
    """texture.h:25-42 CheckerTexture as a callable for oracle Lambertian."""
    even = np.asarray(even, np.float64)
    odd = np.asarray(odd, np.float64)

    def value(p):
        sines = math.sin(10 * p[0]) * math.sin(10 * p[1]) * math.sin(10 * p[2])
        return (odd if sines < 0 else even).copy()

    return value


class Metal:
    def __init__(self, albedo, fuzz=0.0):
        self.albedo = np.asarray(albedo, np.float64)
        self.fuzz = min(fuzz, 1.0)

    def emitted(self, rec):
        return np.zeros(3)

    def scatter(self, o, d, rec, sampler):
        reflected = reflect(unit(d), rec["normal"])
        nd = reflected + self.fuzz * sampler.unit_ball()
        return np.dot(nd, rec["normal"]) > 0, rec["p"], nd, self.albedo.copy()


class Dielectric:
    def __init__(self, ref_idx):
        self.ref_idx = ref_idx

    def emitted(self, rec):
        return np.zeros(3)

    def scatter(self, o, d, rec, sampler):
        n = rec["normal"]
        reflected = reflect(d, n)
        if np.dot(d, n) > 0:
            outward = -n
            ni_over_nt = self.ref_idx
            cosine = np.dot(d, n) / np.linalg.norm(d)
            cosine = math.sqrt(max(1 - self.ref_idx ** 2 * (1 - cosine ** 2), 0.0))
        else:
            outward = n
            ni_over_nt = 1.0 / self.ref_idx
            cosine = -np.dot(d, n) / np.linalg.norm(d)
        ok, refracted = refract(d, outward, ni_over_nt)
        reflect_prob = schlick(cosine, self.ref_idx) if ok else 1.0
        direction = reflected if sampler.uniform() < reflect_prob else refracted
        return True, rec["p"], direction, np.ones(3)


class DiffuseLight:
    def __init__(self, emit):
        self.emit = np.asarray(emit, np.float64)

    def emitted(self, rec):
        return self.emit.copy()

    def scatter(self, o, d, rec, sampler):
        return False, rec["p"], d, np.zeros(3)


class ZeroSampler:
    """All stochastic draws return 0 — pins lambertian to normal-direction
    scatter, metal fuzz to pure mirror, and dielectric to pure REFLECTION
    (uniform() = 0 always satisfies `0 < reflect_prob`, since Schlick's r0
    is strictly positive for any ref_idx != 1)."""

    def unit_ball(self):
        return np.zeros(3)

    def uniform(self):
        return 0.0


class InjectedSampler:
    """Per-bounce-step injected draws for ONE ray, matching the layout of
    cudaraytracer_tpu.ops.integrators.SampleStream: scan step i (== recursion
    depth max_depth - i) consumes ball[i] and prob[i] regardless of which
    material (or none) actually uses them — the branch-free renderers draw
    both every step.  shade() announces the current recursion depth via
    on_depth() so the cursor stays aligned even though this oracle only
    *consumes* draws lazily."""

    def __init__(self, balls, probs, max_depth):
        self.balls = np.asarray(balls, np.float64)   # (max_depth+1, 3)
        self.probs = np.asarray(probs, np.float64)   # (max_depth+1,)
        self.max_depth = max_depth
        self.step = 0

    def on_depth(self, depth):
        self.step = self.max_depth - depth

    def unit_ball(self):
        return self.balls[self.step].copy()

    def uniform(self):
        return float(self.probs[self.step])


# --- integrators ------------------------------------------------------------

def shade(world, o, d, depth, sampler, ambient=0.1):
    """render.h:48-67."""
    rec = world.hit(o, d, 0.001, FLT_MAX)
    if rec is not None:
        mat = rec["mat"]
        emitted = mat.emitted(rec)
        if depth > 0:
            if hasattr(sampler, "on_depth"):
                sampler.on_depth(depth)
            ok, so, sd, att = mat.scatter(o, d, rec, sampler)
            if ok:
                return emitted + att * shade(world, so, sd, depth - 1, sampler, ambient)
        return emitted + np.full(3, ambient)
    return background_sky(d)


def lambert_shade(world, o, d, sampler):
    """render.h:70-87 (unnormalized direction dot)."""
    rec = world.hit(o, d, 0.001, FLT_MAX)
    if rec is None:
        return background_sky(d)
    _, _, _, att = rec["mat"].scatter(o, d, rec, sampler)
    t = max(np.dot(d, rec["normal"]), 0.0)
    return att * t * background_sky(d) * 0.2 + rec["mat"].emitted(rec)


# --- camera -----------------------------------------------------------------

class Camera:
    def __init__(self, lookfrom, lookat, vup, vfov, aspect, aperture, focus_dist):
        lookfrom = np.asarray(lookfrom, np.float64)
        lookat = np.asarray(lookat, np.float64)
        vup = np.asarray(vup, np.float64)
        self.lens_radius = aperture / 2
        theta = vfov * math.pi / 180
        hh = math.tan(theta / 2)
        hw = hh * aspect
        self.origin = lookfrom
        self.z = unit(lookfrom - lookat)
        self.x = unit(np.cross(vup, self.z))
        self.y = np.cross(self.z, self.x)
        self.lower_left = (self.origin - hw * focus_dist * self.x
                           - hh * focus_dist * self.y - focus_dist * self.z)
        self.horizontal = 2 * hw * focus_dist * self.x
        self.vertical = 2 * hh * focus_dist * self.y

    def get_ray(self, s, t):
        return self.origin, (self.lower_left + s * self.horizontal
                             + t * self.vertical - self.origin)
