from .elastic import FitCheckpointer, Watchdog
from .mesh import RAY_AXIS, initialize_multihost, make_mesh
from .render import make_fit_step, make_sharded_renderer

__all__ = [
    "RAY_AXIS",
    "initialize_multihost",
    "make_mesh",
    "make_fit_step",
    "make_sharded_renderer",
    "FitCheckpointer",
    "Watchdog",
]
