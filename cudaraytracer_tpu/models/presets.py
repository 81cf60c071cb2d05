"""Canonical scenes for tests and benchmarks (BASELINE.json configs).

These correspond to the measurement configs in BASELINE.md:
  three_spheres   — config[0]: Lambertian/metal/dielectric trio on a ground
                    sphere ("Ray Tracing in One Weekend" ch.12 layout).
  random_spheres  — config[1]: the "One Weekend" final scene (~500 spheres).
  mesh_scene      — config[2] builder: triangle-mesh OBJ scene (see utils.obj_loader).
  light_box       — emissive rectangle + checker floor, exercising
                    DiffuseLight + CheckerTexture + Rectangle paths.
"""

from __future__ import annotations

import numpy as np

from ..core.camera import Camera, make_camera
from .scene import SceneBuilder


def three_spheres(aspect: float = 16 / 9):
    """Lambertian center, metal right, dielectric left, big ground sphere."""
    b = SceneBuilder()
    m = b.materials
    ground = m.lambertian(color=(0.8, 0.8, 0.0))
    center = m.lambertian(color=(0.1, 0.2, 0.5))
    left = m.dielectric(1.5)
    right = m.metal((0.8, 0.6, 0.2), fuzz=0.0)
    b.add_sphere((0, -100.5, -1), 100.0, ground)
    b.add_sphere((0, 0, -1), 0.5, center)
    b.add_sphere((-1, 0, -1), 0.5, left)
    b.add_sphere((1, 0, -1), 0.5, right)
    cam = make_camera((0, 0.35, 1.2), (0, 0, -1), (0, 1, 0), 45.0, aspect, 0.0, 10.0)
    return b.build(), cam


def random_spheres(aspect: float = 16 / 9, seed: int = 7, n: int = 22):
    """'One Weekend' final scene: n x n grid of small random spheres + 3 big."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    m = b.materials
    ground = m.lambertian(tex_id=m.textures.checker((0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))
    b.add_sphere((0, -1000, 0), 1000.0, ground)
    half = n // 2
    for a in range(-half, half):
        for c in range(-half, half):
            choose = rng.uniform()
            cen = np.array([a + 0.9 * rng.uniform(), 0.2, c + 0.9 * rng.uniform()])
            if np.linalg.norm(cen - np.array([4, 0.2, 0])) <= 0.9:
                continue
            if choose < 0.8:
                albedo = rng.uniform(size=3) * rng.uniform(size=3)
                b.add_sphere(cen, 0.2, m.lambertian(color=albedo))
            elif choose < 0.95:
                albedo = 0.5 * (1 + rng.uniform(size=3))
                b.add_sphere(cen, 0.2, m.metal(albedo, 0.5 * rng.uniform()))
            else:
                b.add_sphere(cen, 0.2, m.dielectric(1.5))
    b.add_sphere((0, 1, 0), 1.0, m.dielectric(1.5))
    b.add_sphere((-4, 1, 0), 1.0, m.lambertian(color=(0.4, 0.2, 0.1)))
    b.add_sphere((4, 1, 0), 1.0, m.metal((0.7, 0.6, 0.5), 0.0))
    cam = make_camera((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0, aspect, 0.0, 10.0)
    return b.build(), cam


def light_box(aspect: float = 1.0):
    """Emissive rect + checker floor + metal sphere: textures/lights/rects."""
    b = SceneBuilder()
    m = b.materials
    floor = m.lambertian(tex_id=m.textures.checker((0.1, 0.1, 0.1), (0.9, 0.9, 0.9)))
    light = m.diffuse_light(color=(4.0, 4.0, 4.0))
    shiny = m.metal((0.9, 0.9, 0.9), 0.05)
    b.add_sphere((0, -1000, 0), 1000.0, floor)
    b.add_sphere((0, 1, 0), 1.0, shiny)
    b.add_rect(light, flip=True, position=(0, 2, 3), rotation=(0, 0, 0),
               scale=(3, 3, 1))
    cam = make_camera((0, 2, 8), (0, 1, 0), (0, 1, 0), 35.0, aspect, 0.0, 10.0)
    return b.build(), cam


def fbx_walk_camera(aspect: float = 2.0) -> Camera:
    """The active camera config for the FBX pipeline (createScene.h:160)."""
    return make_camera((0, 100, 1000), (0, 150, 0), (0, 1, 0), 40.0, aspect,
                       0.0, 10.0)
