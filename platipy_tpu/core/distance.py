"""Euclidean distance transforms on device.

TPU-native replacement for ITK's ``SignedMaurerDistanceMapImageFilter``
(reference call sites: registration/utils.py:289, label/comparison.py:56-100,
utils/conduction.py:39).

Algorithm: exact separable EDT via per-axis min-plus convolution with the
parabolic cost ``(d * spacing)^2`` — the vectorised equivalent of
Maurer/Felzenszwalb.  Each axis pass is a bounded ``fori_loop`` of shifted
elementwise minima: O(n) fused VPU sweeps over the volume, no data-dependent
control flow, fully jit/vmap/shard_map compatible.  ``max_distance_vox`` bounds
the sweep for morphology-style queries (dilate-by-r needs only r voxels).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image

__all__ = [
    "squared_edt",
    "edt",
    "signed_maurer_distance_map",
]

_INF = 1e10


def _edt_pass(fsq: jnp.ndarray, axis: int, spacing: float, max_offset: Optional[int] = None):
    """One min-plus parabolic pass: out[i] = min_j fsq[j] + ((i-j)*spacing)^2."""
    n = fsq.shape[axis]
    w = n - 1 if max_offset is None else int(min(n - 1, max_offset))
    if w <= 0:
        return fsq
    pad = [(0, 0)] * fsq.ndim
    pad[axis] = (w, w)
    padded = jnp.pad(fsq, pad, constant_values=_INF)
    s2 = float(spacing) ** 2

    def body(d, acc):
        off = d - w
        shifted = jax.lax.dynamic_slice_in_dim(padded, d, n, axis)
        cost = shifted + (off.astype(fsq.dtype) ** 2) * s2
        return jnp.minimum(acc, cost)

    init = jnp.full_like(fsq, _INF)
    return jax.lax.fori_loop(0, 2 * w + 1, body, init)


def squared_edt(
    mask: jnp.ndarray,
    spacing_xyz=(1.0, 1.0, 1.0),
    max_distance_vox: Optional[int] = None,
) -> jnp.ndarray:
    """Squared Euclidean distance from each voxel to the nearest True voxel.

    ``mask`` is [z,y,x] bool/int; spacing in (x,y,z).  Voxels inside the mask
    get 0.  If the mask is empty everything is ~_INF.
    """
    s = np.asarray(spacing_xyz, dtype=np.float64).reshape(-1)
    if s.size == 1:
        s = np.repeat(s, 3)
    return _squared_edt_jit(
        jnp.asarray(mask),
        spacing_key=tuple(float(v) for v in s),
        max_distance_vox=None if max_distance_vox is None else int(max_distance_vox),
    )


@partial(jax.jit, static_argnames=("spacing_key", "max_distance_vox"))
def _squared_edt_jit(mask, *, spacing_key, max_distance_vox):
    s = spacing_key
    m = mask > 0
    fsq = jnp.where(m, 0.0, _INF).astype(jnp.float32)
    fsq = _edt_pass(fsq, 2, s[0], max_distance_vox)  # x
    fsq = _edt_pass(fsq, 1, s[1], max_distance_vox)  # y
    fsq = _edt_pass(fsq, 0, s[2], max_distance_vox)  # z
    return fsq


def edt(mask, spacing_xyz=(1.0, 1.0, 1.0), max_distance_vox: Optional[int] = None):
    """Euclidean distance to the nearest True voxel (scipy ``distance_transform_edt``
    of the inverted mask, i.e. distances measured *outside* the mask)."""
    return jnp.sqrt(squared_edt(mask, spacing_xyz, max_distance_vox))


def signed_maurer_distance_map(
    mask_image: Image,
    inside_is_positive: bool = False,
    squared_distance: bool = False,
    use_image_spacing: bool = True,
    max_distance_vox: Optional[int] = None,
) -> Image:
    """``sitk.SignedMaurerDistanceMap`` analogue.

    ITK convention (verified against the reference's surface-metric goldens,
    test_metrics.py:52): the magnitude is the distance to the mask's *inner
    boundary voxels* (the contour — mask voxels with a face-adjacent
    background neighbour), zero on the contour itself, negative inside.
    For outside voxels this equals the distance to the nearest inside voxel.
    """
    from platipy_tpu.core.morphology import label_contour

    m = mask_image.array > 0
    contour = label_contour(m) > 0
    spacing = mask_image.spacing if use_image_spacing else (1.0, 1.0, 1.0)
    d_sq = squared_edt(contour, spacing, max_distance_vox)
    if squared_distance:
        signed = jnp.where(m & ~contour, -d_sq, d_sq)
    else:
        d = jnp.sqrt(d_sq)
        signed = jnp.where(m & ~contour, -d, d)
    if inside_is_positive:
        signed = -signed
    return mask_image.with_array(signed.astype(jnp.float32))
