from . import opcodes, oracle, raygen, sdf, tape
from .march import make_march, make_renderer, render_rays

__all__ = ["opcodes", "oracle", "raygen", "sdf", "tape", "make_march", "make_renderer", "render_rays"]
