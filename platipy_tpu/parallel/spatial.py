"""Spatial sharding of a single large volume with halo exchange.

The reference scales volume size with pyramids / cropping / coarser voxels
only (SURVEY §5.7); when one CT at full resolution exceeds per-chip HBM, the
TPU-native answer is to shard the z axis over the mesh and exchange stencil
halos over ICI.  This module provides:

* :func:`spatial_mesh` — a 1-D ``Mesh`` over the ``'spatial'`` axis;
* :func:`shard_over_z` — put a [z,y,x(,c)] volume on the mesh, z-sharded;
* :func:`convolve_separable_sharded` — separable convolution with one halo
  exchange (``ppermute`` of edge slabs) before the z pass;
* :func:`demons_level_spatial` — a demons level where every chip holds a z
  slab; the displacement field's halo is refreshed by two ``ppermute``s per
  iteration and the slab result equals the single-device program exactly
  (the exchanged halo covers the full per-iteration dependency radius
  ``max_disp + 1 + r_update + r_field``).

Everything here runs under ``shard_map`` so XLA emits the collectives and the
slab compute as one program per chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from platipy_tpu.core import filters as _filters

__all__ = [
    "spatial_mesh",
    "shard_over_z",
    "convolve_separable_sharded",
    "demons_level_spatial",
]


def spatial_mesh(n_devices: int = 0) -> Mesh:
    devices = np.asarray(jax.devices())
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=("spatial",))


def shard_over_z(arr: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    spec = P("spatial", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _exchange_z(a: jnp.ndarray, h: int, n_shards: int) -> jnp.ndarray:
    """Extend a local z slab by ``h`` rows from each neighbour (edge-replicate
    at the global boundary, matching the unsharded filters' padding)."""
    if h == 0:
        return a
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i, i - 1) for i in range(1, n_shards)]
    from_prev = jax.lax.ppermute(a[-h:], "spatial", fwd)
    from_next = jax.lax.ppermute(a[:h], "spatial", bwd)
    idx = jax.lax.axis_index("spatial")
    edge_top = jnp.repeat(a[:1], h, axis=0)
    edge_bot = jnp.repeat(a[-1:], h, axis=0)
    from_prev = jnp.where(idx == 0, edge_top, from_prev)
    from_next = jnp.where(idx == n_shards - 1, edge_bot, from_next)
    return jnp.concatenate([from_prev, a, from_next], axis=0)


def convolve_separable_sharded(arr: jnp.ndarray, kernels, mesh: Mesh) -> jnp.ndarray:
    """Separable (z, y, x) convolution of a z-sharded volume: one halo
    exchange for the z kernel's radius, then the ordinary per-axis passes on
    each slab (y/x are chip-local)."""
    kz = np.asarray(kernels[0], dtype=np.float64)
    h = int(len(kz) // 2)
    n_shards = mesh.devices.size
    kernels_key = tuple(
        tuple(float(v) for v in np.asarray(k, dtype=np.float64)) for k in kernels
    )

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("spatial", *([None] * (arr.ndim - 1))),
        out_specs=P("spatial", *([None] * (arr.ndim - 1))),
    )
    def run(a):
        ext = _exchange_z(a, h, n_shards)
        out = _filters.convolve_separable(
            ext, [np.asarray(k) for k in kernels_key]
        )
        return out[h : ext.shape[0] - h] if h else out

    return run(arr)


def demons_level_spatial(
    fixed: jnp.ndarray,
    moving: jnp.ndarray,
    init_field: jnp.ndarray,
    mesh: Mesh,
    *,
    iterations: int,
    spacing: Tuple[float, float, float],
    std_kernels_key,
    update_kernels_key,
    max_step_vox: float = 1.25,
    max_disp_vox: Tuple[int, int, int] = (8, 8, 8),
    max_rms_error=None,
) -> jnp.ndarray:
    """Fast-symmetric-forces demons level with the volume z-sharded.

    ``max_rms_error`` (mm): ITK PDE-framework convergence — stop once the
    global RMS magnitude of the applied update (interior slabs, reduced
    over the mesh with psum) drops below the threshold; None keeps the
    exact fixed trip count.

    Same semantics as ``registration.deformable._demons_level_impl`` (ESM
    force, intensity-difference threshold, per-iteration update/field
    smoothing) but every chip holds one z slab; the field halo is refreshed
    each iteration over ICI.  Inputs may be sharded or replicated; the result
    is z-sharded.

    Parity: matches the single-device program up to f32 reassociation (the
    slab programs fuse/sum in a different order).  The ESM intensity
    threshold (|diff| > 1e-3) is discontinuous, so reassociation-level input
    differences can flip individual voxel updates — over a full level this
    accumulates to a few percent of the peak displacement locally, the same
    sensitivity any recompilation of the unsharded program has.
    """

    spacing_arr = np.asarray(spacing, dtype=np.float64)
    k_norm = 4.0 * (max_step_vox**2) * float(np.mean(spacing_arr**2))
    std_kernels = [np.asarray(k) for k in std_kernels_key]
    update_kernels = [np.asarray(k) for k in update_kernels_key]
    r1 = len(update_kernels[0]) // 2
    r2 = len(std_kernels[0]) // 2
    dz = int(max_disp_vox[2])
    # per-iteration dependency radius: warp taps reach max_disp+1 (the lerp
    # samples floor(offset)+1), gradient +1, then both smoothing radii
    halo = (dz + 1) + 1 + r1 + r2
    n_shards = mesh.devices.size
    z_local = fixed.shape[0] // n_shards
    if halo > z_local:
        raise ValueError(
            f"per-iteration halo ({halo} = max_disp_z {dz} + 1 + update radius "
            f"{r1} + field radius {r2}) exceeds the per-shard slab "
            f"({fixed.shape[0]} / {n_shards} = {z_local} slices); shard over "
            "fewer devices or use a larger volume"
        )
    sx, sy, sz = (float(s) for s in spacing)

    spec3 = P("spatial", None, None)
    spec4 = P("spatial", None, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec3, spec3, spec4),
        out_specs=spec4,
    )
    def run(fixed_l, moving_l, field_l):
        f_ext = _exchange_z(fixed_l, halo, n_shards)
        m_ext = _exchange_z(moving_l, halo, n_shards)
        grad_f = _filters.gradient(f_ext, spacing)

        nz_global = z_local * n_shards
        idx = jax.lax.axis_index("spatial")

        def warp_by_field(vol, field):
            # per-axis passes; the z inside-mask must come from the RAW
            # offset against GLOBAL bounds (ITK semantics: mask from the raw
            # displacement, value from the clamped taps) — warp_multipass
            # would mask against the ext-slab extent instead
            from platipy_tpu.core.interp import _lerp_shift_axis

            ox = field[..., 0] / sx
            oy = field[..., 1] / sy
            oz = field[..., 2] / sz
            out, in_x = _lerp_shift_axis(vol, ox, 2, int(max_disp_vox[0]))
            out, in_y = _lerp_shift_axis(out, oy, 1, int(max_disp_vox[1]))
            out, _ = _lerp_shift_axis(out, oz, 0, dz)
            gz = (
                jax.lax.broadcasted_iota(jnp.float32, vol.shape, 0)
                - halo + (idx * z_local).astype(jnp.float32)
            )
            u_gz = gz + oz
            in_z = (u_gz >= -0.5) & (u_gz <= nz_global - 0.5)
            return jnp.where(in_x & in_y & in_z, out, 0.0)

        def rep_band(a):
            """Overwrite the out-of-global halo band with the global boundary
            row — the sharded analogue of the unsharded program's
            edge-replicate padding for gradients and smoothing."""
            top = jnp.repeat(a[halo : halo + 1], halo, axis=0)
            bot = jnp.repeat(a[-halo - 1 : -halo], halo, axis=0)
            a = jnp.where(idx == 0, jnp.concatenate([top, a[halo:]], 0), a)
            a = jnp.where(
                idx == n_shards - 1, jnp.concatenate([a[:-halo], bot], 0), a
            )
            return a

        def step(field_loc):
            field = _exchange_z(field_loc, halo, n_shards)
            m_w = rep_band(warp_by_field(m_ext, field))
            grad_m = _filters.gradient(m_w, spacing)
            diff = f_ext - m_w
            j = 0.5 * (grad_f + grad_m)
            j_sq = jnp.sum(j * j, axis=-1)
            denom = j_sq + (diff * diff) / k_norm
            valid = (jnp.abs(diff) > 1e-3) & (denom > 1e-9)
            scale = jnp.where(valid, diff / jnp.maximum(denom, 1e-9), 0.0)
            update = rep_band(j * scale[..., None])
            update = _filters.convolve_separable(update, update_kernels)
            # the band must replicate the summed field too: the unsharded
            # program edge-pads (field + smoothed update), not its addends
            field = rep_band(field + update)
            field = _filters.convolve_separable(field, std_kernels)
            return field[halo : field.shape[0] - halo], update

        if max_rms_error is None:
            return jax.lax.fori_loop(
                0, iterations, lambda _, f: step(f)[0], field_l
            )

        # global RMS of the APPLIED update (ITK RMSChange semantics, see
        # registration.deformable._demons_level_impl): each shard sums its
        # interior band — every global voxel exactly once — and psum makes
        # the while condition replicated across the mesh
        thresh = jnp.float32(max_rms_error)
        n_global = jnp.float32(nz_global * fixed_l.shape[1] * fixed_l.shape[2])

        def cond(state):
            i, rms, _ = state
            return (i < iterations) & (rms >= thresh)

        def wbody(state):
            i, _, field_loc = state
            new_field, update = step(field_loc)
            interior = update[halo : update.shape[0] - halo]
            sumsq = jax.lax.psum(jnp.sum(interior * interior), "spatial")
            rms = jnp.sqrt(sumsq / n_global)
            return i + 1, rms, new_field

        _, _, out = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), jnp.float32(jnp.inf), field_l)
        )
        return out

    return run(fixed, moving, init_field)
