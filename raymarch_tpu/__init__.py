"""raymarch_tpu: a TPU-native differentiable SDF ray-marching framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of the
Mesoptier/ray-marching Rust+wgpu renderer: sphere-traced rendering of a
runtime-editable CSG graph of SDF primitives, compiled to a flat tape that is
evaluated per march step on-device — differentiable end-to-end and sharded
across TPU pod slices. See SURVEY.md for the reference analysis and
ARCHITECTURE.md for the design.
"""

from . import io, native
from .config import DEFAULT_CONFIG, RenderConfig
from .fit import fit_scene
from .models import csg, graph
from .models.csg import box, capsule, cone, cylinder, plane, sphere, torus
from .models.graph import CSGNodeGraph
from .ops import oracle
from .ops.march import make_march, make_renderer, render_rays
from .ops.raygen import camera_rays_np, raygen_flat
from .ops.sdf import make_scene_fn
from .ops.tape import TapeArrays, TapeSpec, compile_scene, compile_wire, encode_wire
from .utils.camera import Camera, OrbitCameraController
from .viewer import ViewerApp
from .utils.stats import MarchStats, march_stats
from .runtime import TieredRenderer

__version__ = "0.1.0"

__all__ = [
    "io",
    "native",
    "fit_scene",
    "graph",
    "CSGNodeGraph",
    "MarchStats",
    "march_stats",
    "DEFAULT_CONFIG",
    "RenderConfig",
    "csg",
    "sphere",
    "box",
    "torus",
    "plane",
    "cylinder",
    "capsule",
    "cone",
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
    "ViewerApp",
    "TieredRenderer",
]
