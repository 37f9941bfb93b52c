from . import camera, math3d
from .cache import enable_persistent_cache

__all__ = ["camera", "math3d", "enable_persistent_cache"]
from . import profiling, stats
