"""Sharded rendering and training: the multi-chip data path.

Parallelization model (SURVEY.md §2.3): rays are embarrassingly parallel, so
the pixel grid is sharded **by image rows** over the 1-D "rays" mesh axis via
`shard_map`; the scene (TapeArrays) and camera are replicated. Each device
renders its own row band — including all AA samples of its pixels, so the AA
average never crosses devices. The ONLY cross-device communication in the
whole system is the gradient `psum` in the fit step (and a `psum` for the
scalar loss), which XLA overlaps with the backward pass.

Row bands are padded so every device gets the same number of rows; padded
rows are cropped from the output and masked out of the loss.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_CONFIG, RenderConfig
from ..ops.march import _gamma, _make_albedo_fn, make_march, shade
from ..ops.raygen import raygen_flat
from ..ops.sdf import make_scene_fn
from ..ops.tape import TapeArrays, TapeSpec
from .mesh import RAY_AXIS


def _row_band_indices(i0, rows, width, height, aa_samples):
    """Flat (pixel-major, see ops.raygen) ray indices for image rows
    [i0, i0+rows): r = ((i*W + j)*S + s)."""
    s = aa_samples * aa_samples
    ri = (i0 + jnp.arange(rows, dtype=jnp.int32))[:, None, None] * (width * s)
    ci = jnp.arange(width, dtype=jnp.int32)[None, :, None] * s
    si = jnp.arange(s, dtype=jnp.int32)[None, None, :]
    return (ri + ci + si).reshape(-1)


def _band_cam_vec(camera, i0):
    return jnp.concatenate(
        [
            jnp.asarray(camera.position, jnp.float32),
            jnp.asarray(camera.rotation, jnp.float32),
            jnp.asarray(i0, jnp.float32).reshape(1),
        ]
    )


def _local_renderer(spec, width, height, cfg, mode, backend, rows_per=None,
                    interpret=False):
    """Per-device row-band renderer: (arrays, camera, i0, rows) -> [rows,W,3].

    backend "pallas_prepass" runs the fully fused cone-prepass kernels per
    band (forward-only; the fastest path). backend "pallas_fused" runs the
    fused forward AND keeps the band differentiable through the Pallas
    backward kernel (ops.pallas_grad) — the production fit path. Both
    receive the band's first row at runtime via the camera vector, so one
    compiled kernel serves every device's band.
    """
    if backend in ("pallas_prepass", "pallas_fused"):
        assert rows_per is not None
        if backend == "pallas_prepass":
            from ..ops.pallas_prepass import make_pallas_image_render_aa

            kw = dict(bm_coarse=8, bm_fine=8) if interpret else {}
            band = make_pallas_image_render_aa(
                spec, cfg, width, height, prepass_block=1, band_rows=rows_per,
                interpret=interpret, aa_packed=not cfg.aa_shared_normals,
                **kw
            )
        else:
            from ..ops.pallas_grad import make_fused_render_vjp

            kw = dict(bm=8) if interpret else {}
            band = make_fused_render_vjp(
                spec, cfg, width, height, band_rows=rows_per,
                interpret=interpret, **kw
            )

        def render_band_fused(arrays, camera, i0, rows):
            return band(arrays, _band_cam_vec(camera, i0))

        render_band_fused.backward_info = getattr(
            band, "backward_info",
            {"kind": "forward_only", "compact": False, "reason": None},
        )
        return render_band_fused

    scene = make_scene_fn(spec, cfg)
    soft = mode == "soft"
    if backend == "pallas":
        from ..ops.pallas_march import make_march_pallas

        march = make_march_pallas(spec, cfg)
    elif soft:
        from ..ops.march import make_march_soft, shade_soft

        march = make_march_soft(spec, cfg)
    else:
        march = make_march(spec, cfg, mode)
    s = cfg.aa_samples * cfg.aa_samples

    def render_band(arrays, camera, i0, rows):
        idx = _row_band_indices(i0, rows, width, height, cfg.aa_samples)
        origins, dirs = raygen_flat(
            idx, camera.position, camera.rotation, width, height, cfg
        )
        # (backward_info set below — the jnp/pallas march backends all
        # differentiate through the jnp implicit/unrolled VJP chain)
        if soft:
            t, hit, s_min, t_min = march(origins, dirs, arrays)
            color = shade_soft(
                scene, origins, dirs, t, hit, s_min, t_min, arrays, cfg,
                _make_albedo_fn(spec, cfg),
            )
        else:
            t, hit, _ = march(origins, dirs, arrays)
            color = shade(
                scene, origins, dirs, t, hit, arrays, cfg,
                _make_albedo_fn(spec, cfg),
            )
        color = _gamma(color)
        return color.reshape(rows, width, s, 3).mean(axis=2)

    render_band.backward_info = {
        "kind": f"jnp_{mode}" if backend != "pallas" else "pallas_fwd_jnp_vjp",
        "compact": False,
        "reason": None,
    }
    return render_band


def make_sharded_renderer(
    spec: TapeSpec,
    width: int,
    height: int,
    mesh: Mesh,
    cfg: RenderConfig = DEFAULT_CONFIG,
    mode: str = "forward",
    backend: str = "jnp",
    interpret: bool = False,
    row_interleave: int = 1,
):
    """`render(arrays, camera) -> image[H,W,3]`, row-sharded over the mesh.

    The scene and camera are replicated; the output image is sharded by rows
    (gathered implicitly when the caller materializes it).

    `row_interleave` = k splits the image into k*n_devices CONTIGUOUS bands
    and assigns them round-robin: device d renders bands d, d+n, ..., so
    each device gets a SPREAD of sky-heavy and scene-center rows instead of
    one contiguous block — the load-balance fix for the straggler-band
    problem (ARCHITECTURE.md, row-band skew). Bands stay contiguous inside
    each kernel launch, so the per-tile cone/cull accelerators keep their
    spatial locality (a per-ROW stride would spread every kernel tile
    across the whole image and void the tile cones); the cost is k kernel
    launches per device per frame. AA never crosses rows, so any k is
    exact.
    """
    n = mesh.shape[RAY_AXIS]
    k = max(1, int(row_interleave))
    m = n * k  # total bands, band b owned by device b % n
    band_rows = -(-height // m)  # ceil
    h_pad = band_rows * m
    render_band = _local_renderer(
        spec, width, height, cfg, mode, backend, band_rows, interpret
    )

    def local_fn(arrays, camera):
        d = jax.lax.axis_index(RAY_AXIS)
        outs = [
            render_band(arrays, camera, (d + j * n) * band_rows, band_rows)
            for j in range(k)
        ]
        return outs[0] if k == 1 else jnp.concatenate(outs, axis=0)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(RAY_AXIS, None, None),
        check_vma=False,
    )

    def render(arrays: TapeArrays, camera):
        img = sharded(arrays, camera)
        if k > 1:
            # Gathered row blocks arrive in (device, j) order; image band
            # b = d + j*n sits at block d*k + j -> transpose to b order.
            img = (
                img.reshape(n, k, band_rows, width, 3)
                .transpose(1, 0, 2, 3, 4)
                .reshape(h_pad, width, 3)
            )
        return img[:height] if h_pad != height else img

    return render


def make_fit_step(
    spec: TapeSpec,
    width: int,
    height: int,
    mesh: Mesh,
    optimizer,
    cfg: RenderConfig = DEFAULT_CONFIG,
    mode: str = "implicit",
    backend: str = "jnp",
    fit_camera: bool = False,
    grad_mask=None,
    interpret: bool = False,
    camera_optimizer=None,
    row_interleave: int = 1,
):
    """Build a pjit-able distributed training step for inverse rendering
    (BASELINE config 3: fit primitive params / blend radii to a target image
    by pixel-loss gradients).

    step(arrays, camera, opt_state, target[H,W,3]) ->
        (new_arrays, new_camera, new_opt_state, loss)

    With fit_camera, the pose is trained by `camera_optimizer` (any optax
    optimizer; default sgd(1e-2)), with the rotation projected back onto
    the unit-quaternion manifold after each update; its state rides inside
    `opt_state` alongside the scene-parameter state, so `init_opt_state`
    then takes the camera too: init_opt_state(arrays, camera).

    Inside shard_map each device computes the gradient of ITS row bands'
    summed squared error w.r.t. the replicated parameters, then `psum`s
    gradients and loss over the mesh — the all-reduce is the only
    communication and overlaps with the backward pass under XLA's scheduler.
    `row_interleave` assigns k round-robin bands per device (see
    make_sharded_renderer) — the load-balanced layout.
    """
    n = mesh.shape[RAY_AXIS]
    k = max(1, int(row_interleave))
    m = n * k
    rows_per = -(-height // m)  # rows per BAND
    render_band = _local_renderer(
        spec, width, height, cfg, mode, backend, rows_per, interpret
    )
    denom = float(height * width * 3)

    def local_value_and_grad(arrays, camera, target_shard, d):
        def local_loss(diff_params):
            la, cam = diff_params
            a = dataclasses.replace(
                arrays, leaf_params=la[0], op_param=la[1]
            )
            total = 0.0
            for j in range(k):
                i0 = (d + j * n) * rows_per
                rows_valid = jnp.clip(height - i0, 0, rows_per)
                img = render_band(
                    a, cam if fit_camera else camera, i0, rows_per
                )
                row_mask = (
                    jnp.arange(rows_per, dtype=jnp.int32) < rows_valid
                ).astype(img.dtype)[:, None, None]
                tb = target_shard[j * rows_per : (j + 1) * rows_per]
                total = total + jnp.sum(row_mask * (img - tb) ** 2)
            return total / denom

        diff = ((arrays.leaf_params, arrays.op_param), camera)
        loss, grads = jax.value_and_grad(local_loss)(diff)
        return loss, grads

    def local_fn(arrays, camera, target_shard):
        # target_shard is this device's k bands of the (padded, band-
        # permuted) target, in j order.
        d = jax.lax.axis_index(RAY_AXIS)
        loss, grads = local_value_and_grad(arrays, camera, target_shard, d)
        loss = jax.lax.psum(loss, RAY_AXIS)
        grads = jax.lax.psum(grads, RAY_AXIS)
        return loss, grads

    # Target comes in row-sharded; params/camera replicated; outputs replicated.
    sharded_grads = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS, None, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def pad_target(target):
        h_pad = rows_per * m
        if h_pad != height:
            target = jnp.pad(target, ((0, h_pad - height), (0, 0), (0, 0)))
        if k > 1:
            # Band b = d + j*n must land on device d at local position j:
            # permute (j-major band order) -> (device, j) order.
            target = (
                target.reshape(k, n, rows_per, width, 3)
                .transpose(1, 0, 2, 3, 4)
                .reshape(h_pad, width, 3)
            )
        return target

    if fit_camera and camera_optimizer is None:
        import optax

        camera_optimizer = optax.sgd(1e-2)

    def step(arrays: TapeArrays, camera, opt_state, target):
        if fit_camera:
            param_state, cam_state = opt_state
        else:
            param_state = opt_state
        loss, grads = sharded_grads(arrays, camera, pad_target(target))
        (g_leaf, g_op), g_cam = grads
        if grad_mask is not None:
            # Restrict the fit to selected parameters (adaptive optimizers
            # otherwise take full-size steps along noise directions of
            # parameters the user never meant to move).
            m_leaf, m_op = grad_mask
            g_leaf = g_leaf * jnp.asarray(m_leaf, g_leaf.dtype)
            g_op = g_op * jnp.asarray(m_op, g_op.dtype)
        params = (arrays.leaf_params, arrays.op_param)
        updates, param_state = optimizer.update(
            (g_leaf, g_op), param_state, params
        )
        new_leaf, new_op = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        new_arrays = dataclasses.replace(
            arrays, leaf_params=new_leaf, op_param=new_op
        )
        new_camera = camera
        new_opt_state = param_state
        if fit_camera:
            cam_updates, cam_state = camera_optimizer.update(
                g_cam, cam_state, camera
            )
            new_camera = jax.tree_util.tree_map(
                lambda c, u: c + u, camera, cam_updates
            )
            # Project the rotation back onto the unit-quaternion manifold.
            q = new_camera.rotation
            new_camera = dataclasses.replace(
                new_camera,
                rotation=q / jnp.maximum(jnp.linalg.norm(q), 1e-8),
            )
            new_opt_state = (param_state, cam_state)
        return new_arrays, new_camera, new_opt_state, loss

    def init_opt_state(arrays: TapeArrays, camera=None):
        param_state = optimizer.init((arrays.leaf_params, arrays.op_param))
        if not fit_camera:
            return param_state
        if camera is None:
            raise ValueError(
                "init_opt_state needs the camera when fit_camera=True"
            )
        return param_state, camera_optimizer.init(camera)

    step.init_opt_state = init_opt_state
    # Which backward implementation this step trains through, and (when the
    # fast O(active) kernel was skipped) why — so a smooth/painted scene's
    # fallback to the O(n_leaves) legacy kernel is observable instead of a
    # silent ~10x training slowdown. fit_scene logs it; stats() callers and
    # tests read it directly.
    step.backward_info = render_band.backward_info
    return step
