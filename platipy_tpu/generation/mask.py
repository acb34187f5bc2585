"""Mask generation: bone, external (convex hull), axial extension
(reference: platipy/imaging/generation/mask.py:21-159)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.components import connected_components, relabel_components
from platipy_tpu.core.image import Image
from platipy_tpu.core.morphology import binary_closing, binary_dilate, binary_fill_holes

__all__ = ["get_bone_mask", "get_external_mask", "extend_mask", "convex_hull_image_2d"]


def get_bone_mask(image: Image, lower_threshold=350, upper_threshold=3500,
                  max_hole_size=5) -> Image:
    """Threshold + morphological closing bone mask (reference mask.py:21-47)."""
    bone_mask = image.with_array(
        ((image.array >= lower_threshold) & (image.array <= upper_threshold)).astype(jnp.uint8)
    )
    if max_hole_size is not False:
        if not hasattr(max_hole_size, "__iter__"):
            max_hole_size = (max_hole_size,) * 3
        bone_mask = binary_closing(bone_mask, max_hole_size)
    return bone_mask


def convex_hull_image_2d(mask2d: np.ndarray) -> np.ndarray:
    """Filled 2-D convex hull of a binary slice (skimage convex_hull_image
    equivalent, built on scipy.spatial)."""
    pts = np.argwhere(mask2d)
    if pts.shape[0] < 3:
        return mask2d.astype(bool)
    from scipy.spatial import ConvexHull, Delaunay, QhullError

    try:
        hull = ConvexHull(pts)
    except QhullError:
        return mask2d.astype(bool)
    tri = Delaunay(pts[hull.vertices])
    yy, xx = np.mgrid[: mask2d.shape[0], : mask2d.shape[1]]
    test = np.stack([yy.ravel(), xx.ravel()], axis=1)
    inside = tri.find_simplex(test) >= 0
    return inside.reshape(mask2d.shape)


def get_external_mask(image: Image, lower_threshold=-100, upper_threshold=2500,
                      dilate=1, max_hole_size=False) -> Image:
    """Patient external contour via slice-wise convex hulls (mask.py:50-104)."""
    external_mask = image.with_array(
        ((image.array >= lower_threshold) & (image.array <= upper_threshold)).astype(jnp.uint8)
    )
    components = relabel_components(connected_components(external_mask, connectivity=26))
    body_mask = components.with_array((components.array == 1).astype(jnp.uint8))

    if dilate is not False:
        if not hasattr(dilate, "__iter__"):
            dilate = (dilate,) * 3
        body_mask = binary_dilate(body_mask, dilate)

    if max_hole_size is not False:
        if not hasattr(max_hole_size, "__iter__"):
            max_hole_size = (max_hole_size,) * 3
        body_mask = binary_closing(body_mask, max_hole_size)
        body_mask = binary_fill_holes(body_mask, fully_connected_background=True)

    arr = np.asarray(body_mask.array) > 0
    convex_hull_slices = np.zeros_like(arr)
    for index in range(arr.shape[0]):
        convex_hull_slices[index] = convex_hull_image_2d(arr[index])

    return image.with_array(jnp.asarray(convex_hull_slices.astype(np.uint8)))


def extend_mask(mask: Image, direction=("ax", "sup"), extension_mm=10,
                interior_mm_shape=10) -> Image:
    """Axially extend a binary mask by projecting interior slices
    (reference mask.py:107-159, incl. its inf-branch index arithmetic)."""
    arr_view = np.asarray(mask.array)
    vals = np.unique(arr_view[arr_view > 0])
    if len(vals) > 2:
        cutoff = np.median(vals)
        arr = ((arr_view >= cutoff) & (arr_view <= vals.max())).astype(arr_view.dtype)
    else:
        arr = arr_view.copy()

    if direction[0] == "ax":
        inferior_slice = np.where(arr)[0].min()
        superior_slice = np.where(arr)[0].max()

        n_slices_ext = int(extension_mm / mask.spacing[2])
        n_slices_est = int(interior_mm_shape / mask.spacing[2])

        if direction[1] == "sup":
            max_index = min([arr.shape[0], superior_slice + 1 + n_slices_ext])
            for s_in in range(superior_slice + 1 - n_slices_est, max_index):
                arr[s_in, :, :] = np.max(
                    arr[superior_slice - n_slices_est : superior_slice, :, :], axis=0
                )
        if direction[1] == "inf":
            # DELIBERATE fix of a reference bug: generation/mask.py:150-154
            # clamps with max([arr.shape[0], ...]) (an empty range — the inf
            # branch is a silent no-op there) and reverses its source slice
            min_index = max([0, inferior_slice - n_slices_ext])
            shape_slab = np.max(
                arr[inferior_slice : inferior_slice + n_slices_est, :, :], axis=0
            )
            for s_in in range(min_index, inferior_slice):
                arr[s_in, :, :] = shape_slab

    return mask.with_array(jnp.asarray(arr))


def _extend_sup_arr(arr: "jnp.ndarray", n_ext: int, n_est: int) -> "jnp.ndarray":
    """Device formulation of ``extend_mask(direction=("ax","sup"))`` for a
    binary [z,y,x] array: slices in [sup+1-n_est, min(nz, sup+1+n_ext)) are
    replaced by the elementwise max of the interior slab [sup-n_est, sup) —
    exactly the reference's overwrite loop (mask.py:143-147), but jittable
    and vmappable (the host version pulls + pushes a full volume per call).
    Used by the cardiac pipeline's guide-mask expansion."""
    import jax.numpy as jnp

    nz = arr.shape[0]
    idx = jnp.arange(nz)
    any_z = (arr > 0).any(axis=(1, 2))
    sup = jnp.max(jnp.where(any_z, idx, -1))
    slab_w = ((idx >= sup - n_est) & (idx < sup))[:, None, None]
    slab = jnp.max(jnp.where(slab_w, arr, 0), axis=0)
    max_index = jnp.minimum(nz, sup + 1 + n_ext)
    in_range = ((idx >= sup + 1 - n_est) & (idx < max_index))[:, None, None]
    return jnp.where(in_range, slab[None], arr)

