"""raymarch_tpu: a TPU-native differentiable SDF ray-marching framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of the
Mesoptier/ray-marching Rust+wgpu renderer: sphere-traced rendering of a
runtime-editable CSG graph of SDF primitives, compiled to a flat tape that is
evaluated per march step on-device — differentiable end-to-end and sharded
across TPU pod slices. See SURVEY.md for the reference analysis and
ARCHITECTURE.md for the design.
"""

from .config import DEFAULT_CONFIG, RenderConfig
from .models import csg
from .models.csg import box, plane, sphere, torus
from .ops import oracle
from .ops.march import make_march, make_renderer, render_rays
from .ops.raygen import camera_rays_np, raygen_flat
from .ops.sdf import make_scene_fn
from .ops.tape import TapeArrays, TapeSpec, compile_scene, compile_wire, encode_wire
from .utils.camera import Camera, OrbitCameraController

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_CONFIG",
    "RenderConfig",
    "csg",
    "sphere",
    "box",
    "torus",
    "plane",
    "oracle",
    "make_march",
    "make_renderer",
    "render_rays",
    "camera_rays_np",
    "raygen_flat",
    "make_scene_fn",
    "TapeArrays",
    "TapeSpec",
    "compile_scene",
    "compile_wire",
    "encode_wire",
    "Camera",
    "OrbitCameraController",
]
