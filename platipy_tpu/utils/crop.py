"""Crop/ROI utilities (reference: platipy/imaging/utils/crop.py:24-100).

Sizes and indices use the SimpleITK (x, y, z) convention so the public API is
drop-in compatible; cropping adjusts the image origin so physical coordinates
are preserved.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image

__all__ = ["label_to_roi", "crop_to_roi", "crop_to_label_extent", "paste",
           "pad_roi_to_multiple"]


def pad_roi_to_multiple(size, index, image_size, multiple: int = 32):
    """Grow an (x,y,z) crop box so each side is a multiple of ``multiple``,
    staying inside the image.

    Per-case crop boxes vary by a few voxels, which would force XLA to
    recompile every program for every case; bucketing the sizes makes the
    whole pipeline reuse its compiled programs across cases.
    """
    size = np.asarray(size, dtype=np.int64)
    index = np.asarray(index, dtype=np.int64)
    image_size = np.asarray(image_size, dtype=np.int64)

    target = np.minimum(
        ((size + multiple - 1) // multiple) * multiple, image_size
    )
    grow = target - size
    # grow symmetrically where possible
    new_index = np.maximum(index - grow // 2, 0)
    new_index = np.minimum(new_index, image_size - target)
    return [int(v) for v in target], [int(v) for v in new_index]


def label_to_roi(label, expansion_mm=(0, 0, 0), return_as_list: bool = False):
    """Bounding box of a label (or union of labels), optionally expanded (mm).

    Returns (crop_box_size, crop_box_index), both (x, y, z) — matching
    reference utils/crop.py:24-72 exactly (including the int truncation of the
    voxel expansion and the image-boundary clipping).
    """
    if isinstance(label, (list, tuple)):
        ref = label[0]
        arr = np.zeros(ref.spatial_shape, dtype=bool)
        for item in label:
            arr |= np.asarray(item.array) > 0
        reference_label = Image(jnp.asarray(arr), ref.origin, ref.spacing, ref.direction)
    else:
        reference_label = label
        arr = np.asarray(reference_label.array) > 0

    image_spacing = np.array(reference_label.spacing)

    zz, yy, xx = np.nonzero(arr)
    if xx.size == 0:
        size_xyz = reference_label.size
        if return_as_list:
            return [0, 0, 0] + list(size_xyz)
        return list(size_xyz), [0, 0, 0]

    index = np.array([xx.min(), yy.min(), zz.min()], dtype=np.int64)
    size = np.array(
        [xx.max() - xx.min() + 1, yy.max() - yy.min() + 1, zz.max() - zz.min() + 1],
        dtype=np.int64,
    )

    expansion_mm = np.array(expansion_mm, dtype=np.float64).reshape(-1)
    if expansion_mm.size == 1:
        expansion_mm = np.repeat(expansion_mm, 3)
    expansion = (expansion_mm / image_spacing).astype(int)

    crop_box_index = np.max([index - expansion, np.zeros(3, dtype=np.int64)], axis=0)
    crop_box_size = np.min(
        [
            np.array(reference_label.size) - crop_box_index,
            size + 2 * expansion,
        ],
        axis=0,
    )

    crop_box_size = [int(i) for i in crop_box_size]
    crop_box_index = [int(i) for i in crop_box_index]

    if return_as_list:
        return crop_box_index + crop_box_size

    return crop_box_size, crop_box_index


def crop_to_roi(image: Image, size, index) -> Image:
    """``sitk.RegionOfInterest`` analogue: size/index in (x, y, z)."""
    sx, sy, sz = (int(v) for v in size)
    ix, iy, iz = (int(v) for v in index)
    arr = image.array[iz : iz + sz, iy : iy + sy, ix : ix + sx]
    new_origin = image.physical_point((ix, iy, iz))
    return Image(arr, tuple(new_origin), image.spacing, image.direction)


def crop_to_label_extent(image: Image, label: Image, expansion_mm=0) -> Image:
    if not hasattr(expansion_mm, "__iter__"):
        expansion_mm = [expansion_mm] * 3
    cbox_s, cbox_i = label_to_roi(label, expansion_mm=expansion_mm)
    return crop_to_roi(image, cbox_s, cbox_i)


def paste(
    destination: Image,
    source: Image,
    source_size=None,
    source_index=(0, 0, 0),
    destination_index=(0, 0, 0),
) -> Image:
    """``sitk.Paste`` analogue (all coordinates (x, y, z))."""
    if source_size is None:
        source_size = source.size
    sx, sy, sz = (int(v) for v in source_size)
    six, siy, siz = (int(v) for v in source_index)
    dix, diy, diz = (int(v) for v in destination_index)
    block = source.array[siz : siz + sz, siy : siy + sy, six : six + sx]
    import jax

    out = jax.lax.dynamic_update_slice(
        destination.array, block.astype(destination.array.dtype), (diz, diy, dix)
    )
    return destination.with_array(out)
