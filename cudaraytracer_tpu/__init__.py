"""cudaraytracer_tpu — a TPU-native differentiable ray-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
chocorone/CudaRaytracer (see SURVEY.md): sphere/triangle/rectangle primitives,
Lambertian/metal/dielectric/emissive materials, constant/checker/image
textures, thin-lens camera, sky background, three integrators, BVH with
per-frame refit over skinned animated meshes, OBJ/FBX loading, PNG/CSV output —
plus net-new end-to-end differentiability and multi-chip scaling.
"""

from .config import Quirks, RenderConfig
from .core.camera import Camera, make_camera
from .core.rays import Rays, make_rays
from .models.materials import MaterialBuilder
from .models.scene import Scene, SceneBuilder
from .models.textures import TextureBuilder
from .ops.render import render_image, render_pixels

__version__ = "0.1.0"

__all__ = [
    "Quirks", "RenderConfig", "Camera", "make_camera", "Rays", "make_rays",
    "MaterialBuilder", "Scene", "SceneBuilder", "TextureBuilder",
    "render_image", "render_pixels",
]
