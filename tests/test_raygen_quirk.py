"""The reference's raygen quirk is a NO-OP at its own constants — proof.

The reference unprojects screen points WITHOUT the perspective divide and
normalizes the ray direction as a 4-vector including w (reference
src/ray_marching/ray_marching.wgsl:57-63, noted in SURVEY.md §2.1). This
framework does the math correctly, which raised the question (VERDICT
round 1, "What's missing" #2) of whether a quirk-parity flag is needed for
bitwise A/B against the reference.

It is not, and this file proves why. For the standard perspective matrix P
(nalgebra Perspective3, utils/math3d.py), the unprojected view-space point
of (x, y, -1, 1) is (x*tan*aspect, y*tan, -1, w') with

    w' = (P22 - 1) / P23 = 1 / near          (closed form, derived below)

so with the reference's hard-coded near = 1.0 (renderer.rs:206-207) the
skipped divide divides by w' = 1 and the 4-component normalize carries a
4th component of w' - 1 = 0 — both arithmetic identities. The quirk only
changes output for near != 1, which the reference cannot express.

Derivation of w': row 3 of P x = s gives -Z = s_w => Z = -1 for s=(x,y,-1,1);
row 2 gives P22*Z + P23*W = -1 => W = (P22 - 1)/P23; with
P22 = (f+n)/(n-f), P23 = 2fn/(n-f): P22 - 1 = 2f/(n-f) => W = 1/n.
"""

import dataclasses

import numpy as np

import raymarch_tpu as rm
from raymarch_tpu.ops.raygen import aa_offsets, camera_rays_np
from raymarch_tpu.utils import math3d

CAM = rm.Camera.looking_at(position=(0.4, 1.6, 4.2), target=(0.1, 0.0, 0.0))
W, H = 17, 13


def _reference_quirk_rays(camera, width, height, cfg):
    """The reference's raygen TRANSLITERATED: no perspective divide, ray
    direction = normalize of the 4-vector difference, rd = its xyz
    (wgsl:39-65). Independent implementation for the A/B."""
    n = cfg.aa_samples
    aspect = width / height
    inv_proj = np.linalg.inv(
        math3d.perspective_matrix(aspect, cfg.fovy, cfg.near, cfg.far)
    )
    inv_view = np.linalg.inv(camera.view())

    xs = 2.0 * (np.arange(width) + 0.5) / width - 1.0
    ys = 1.0 - 2.0 * (np.arange(height) + 0.5) / height
    off = aa_offsets(n)
    dx = off * 2.0 / width
    dy = off * 2.0 / height
    sx = xs[None, None, :] + dx.repeat(n)[:, None, None]
    sy = ys[None, :, None] + np.tile(dy, n)[:, None, None]
    sx, sy = np.broadcast_arrays(sx, sy)

    ndc = np.stack([sx, sy, -np.ones_like(sx), np.ones_like(sx)], axis=-1)
    pt_view = ndc @ inv_proj.T  # NO divide by w (the quirk)
    pt_world = pt_view @ inv_view.T
    ro4 = inv_view @ np.array([0.0, 0.0, 0.0, 1.0])
    d4 = pt_world - ro4
    d4 = d4 / np.linalg.norm(d4, axis=-1, keepdims=True)  # 4-norm (the quirk)
    return d4[..., :3], d4[..., 3]


def test_unprojected_w_is_one_over_near():
    for near in (1.0, 0.5, 2.0, 0.1):
        cfg = dataclasses.replace(rm.DEFAULT_CONFIG, near=near)
        inv_proj = np.linalg.inv(
            math3d.perspective_matrix(16 / 9, cfg.fovy, cfg.near, cfg.far)
        )
        w = (inv_proj @ np.array([0.3, -0.2, -1.0, 1.0]))[3]
        np.testing.assert_allclose(w, 1.0 / near, rtol=1e-12)


def test_quirk_is_noop_at_reference_constants():
    # near = 1.0 (the reference's value): quirk rays == correct rays.
    cfg = rm.DEFAULT_CONFIG
    assert cfg.near == 1.0
    _, dirs = camera_rays_np(CAM, W, H, cfg)
    qdirs, qw = _reference_quirk_rays(CAM, W, H, cfg)
    np.testing.assert_allclose(qw, 0.0, atol=1e-9)  # 4th component vanishes
    np.testing.assert_allclose(
        np.linalg.norm(qdirs, axis=-1), 1.0, atol=1e-9
    )  # so rd is unit after all
    np.testing.assert_allclose(qdirs, dirs, atol=1e-6)


def test_quirk_differs_away_from_reference_constants():
    # Sanity that the transliteration is not accidentally the correct math:
    # at near = 0.5 the quirk direction is non-unit and deviates.
    cfg = dataclasses.replace(rm.DEFAULT_CONFIG, near=0.5)
    _, dirs = camera_rays_np(CAM, W, H, cfg)
    qdirs, qw = _reference_quirk_rays(CAM, W, H, cfg)
    assert np.abs(qw).max() > 0.1
    assert np.abs(np.linalg.norm(qdirs, axis=-1) - 1.0).max() > 1e-3
    assert np.abs(qdirs - dirs).max() > 1e-3
