"""Ray generation: perspective camera -> per-pixel (AA-subsampled) rays.

Reference semantics: fullscreen quad in screen space ([-1,1]^2, y up), each
fragment unprojects `(pt_screen, z=-1)` through `inv_proj` then `inv_view`,
ray origin is the camera position, AA offsets form a uniform
`aa_samples x aa_samples` sub-pixel grid (reference
src/ray_marching/ray_marching.wgsl:36-65 and renderer.rs:206-211).

Two implementations, cross-validated in tests:

- `camera_rays_np`: NumPy, via the explicit inverse-projection / inverse-view
  matrices with a proper perspective divide (the mathematically correct form
  of the reference's math; the reference's missing `w`-divide and 4-component
  normalize is a documented quirk we do not reproduce — SURVEY.md §2.1).
- `raygen_flat`: jnp, matrix-free — directions come straight from
  `tan(fovy/2)` in view space rotated by the camera quaternion, computed
  on-device from flat ray indices so renderers can generate rays tile-by-tile
  without materializing the full ray grid in HBM. Differentiable w.r.t.
  camera pose.

Image convention: row 0 = top of image (screen y = +1).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, RenderConfig
from ..utils import math3d
from .sdf import quat_rotate


def aa_offsets(n: int) -> np.ndarray:
    """Sub-pixel offsets in pixel units, (-0.5, 0.5) uniform grid
    (reference wgsl:46-52): [(i+0.5)/n - 0.5 for i in range(n)]."""
    return (np.arange(n) + 0.5) / n - 0.5


def camera_rays_np(camera, width: int, height: int, cfg: RenderConfig = DEFAULT_CONFIG):
    """NumPy spec-path raygen -> (origins[S,H,W,3], dirs[S,H,W,3]), S=aa^2."""
    n = cfg.aa_samples
    aspect = width / height
    inv_proj = np.linalg.inv(
        math3d.perspective_matrix(aspect, cfg.fovy, cfg.near, cfg.far)
    )
    inv_view = np.linalg.inv(camera.view())

    xs = 2.0 * (np.arange(width) + 0.5) / width - 1.0  # [W]
    ys = 1.0 - 2.0 * (np.arange(height) + 0.5) / height  # [H], row 0 = top
    off = aa_offsets(n)
    dx = off * 2.0 / width  # [n]
    dy = off * 2.0 / height

    # Screen points [S, H, W, 2].
    sx = xs[None, None, :] + dx.repeat(n)[:, None, None]
    sy = ys[None, :, None] + np.tile(dy, n)[:, None, None]
    sx, sy = np.broadcast_arrays(sx, sy)

    ndc = np.stack(
        [sx, sy, -np.ones_like(sx), np.ones_like(sx)], axis=-1
    )  # [S,H,W,4]
    pt_view = ndc @ inv_proj.T
    pt_view = pt_view / pt_view[..., 3:4]
    pt_world = pt_view @ inv_view.T

    ro = inv_view[:3, 3]
    d = pt_world[..., :3] - ro
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    origins = np.broadcast_to(ro, d.shape).astype(np.float32)
    return origins.copy(), d.astype(np.float32)


def raygen_flat(
    ray_idx,
    cam_position,
    cam_rotation,
    width: int,
    height: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
):
    """jnp raygen from flat ray indices -> (origins[N,3], dirs[N,3]).

    Ray index order is PIXEL-MAJOR: r = (i*W + j)*S + s with S = aa^2 and
    s = a*aa_samples + b (a indexes x-offsets, b indexes y-offsets). All AA
    samples of one pixel are adjacent, so a contiguous tile of rays covers a
    compact pixel neighborhood — step counts within a tile are coherent,
    which is what makes the march kernel's tile-granularity early exit
    effective. `width`, `height` are static Python ints.
    """
    n = cfg.aa_samples
    S = n * n
    r = jnp.asarray(ray_idx)
    p = r // S
    s = r - p * S
    i = p // width
    j = p - i * width
    a = s // n
    b = s - a * n

    fa = (a.astype(jnp.float32) + 0.5) / n - 0.5
    fb = (b.astype(jnp.float32) + 0.5) / n - 0.5
    x = 2.0 * (j.astype(jnp.float32) + 0.5) / width - 1.0 + fa * 2.0 / width
    y = 1.0 - 2.0 * (i.astype(jnp.float32) + 0.5) / height + fb * 2.0 / height

    t = math.tan(cfg.fovy / 2.0)
    aspect = width / height
    d_view = jnp.stack(
        [x * (t * aspect), y * t, -jnp.ones_like(x)], axis=-1
    )
    d_view = d_view / jnp.linalg.norm(d_view, axis=-1, keepdims=True)
    d_world = quat_rotate(jnp.asarray(cam_rotation)[None, :], d_view)
    origins = jnp.broadcast_to(jnp.asarray(cam_position), d_world.shape)
    return origins, d_world
