"""Geometric cardiac conduction-node generation
(reference: platipy/imaging/utils/conduction.py:26-254).

The slice-wise 2-D morphology/distance steps run host-side on numpy/scipy —
these are tiny (single slices) and control-flow heavy; the 3-D work stays on
device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from platipy_tpu.core.image import Image
from platipy_tpu.core.morphology import binary_dilate, binary_erode
from platipy_tpu.generation.image import insert_sphere_image
from platipy_tpu.label.utils import get_com
from platipy_tpu.utils.crop import crop_to_roi, label_to_roi, paste

__all__ = [
    "get_closest_point_2d",
    "geometric_sinoatrialnode",
    "geometric_atrioventricularnode",
]


def _edt2d(mask2d: np.ndarray, spacing_yx) -> np.ndarray:
    """|distance| to the 2-D mask's inner boundary (ITK SignedMaurer magnitude)."""
    contour = mask2d & ~ndimage.binary_erosion(mask2d)
    if not contour.any():
        return np.full(mask2d.shape, 1e10)
    return ndimage.distance_transform_edt(~contour, sampling=spacing_yx)


def get_closest_point_2d(reference_label_2d: np.ndarray, measurement_label_2d: np.ndarray,
                         spacing_yx=(1.0, 1.0)):
    """Point on measurement closest to reference (reference conduction.py:26-54)."""
    arr_distancemap = _edt2d(reference_label_2d.astype(bool), spacing_yx)
    yloc, xloc = np.where(measurement_label_2d)
    distances = arr_distancemap[yloc, xloc]
    location_of_min = distances.argmin()
    return yloc[location_of_min], xloc[location_of_min]


def geometric_sinoatrialnode(label_svc: Image, label_ra: Image, label_wholeheart: Image,
                             radius_mm: float = 10) -> Image:
    """Geometric SAN (reference conduction.py:57-148)."""
    template_img = label_wholeheart.with_array(
        jnp.zeros(label_wholeheart.spatial_shape, jnp.uint8)
    )
    union = label_wholeheart.with_array(
        (
            (label_svc.array > 0) | (label_ra.array > 0) | (label_wholeheart.array > 0)
        ).astype(jnp.uint8)
    )
    cb_size, cb_index = label_to_roi(union, expansion_mm=(20, 20, 20))

    label_svc = crop_to_roi(label_svc, cb_size, cb_index)
    label_ra = crop_to_roi(label_ra, cb_size, cb_index)
    label_wholeheart = crop_to_roi(label_wholeheart, cb_size, cb_index)

    arr_svc = np.asarray(label_svc.array) > 0
    arr_ra = np.asarray(label_ra.array) > 0

    inf_limit_svc = int(np.min(np.where(arr_svc)[0]))

    # expand the SVC until it touches the RA on the inferior slice
    overlap = 0
    dilate = 1
    dilate_ax = 0
    label_overlap_arr = None
    while overlap == 0:
        svc_dil = binary_dilate(label_svc, (dilate, dilate, dilate_ax))
        label_overlap_arr = (np.asarray(svc_dil.array) > 0) & arr_ra
        overlap = int(label_overlap_arr[inf_limit_svc, :, :].sum())
        dilate += 1
        if dilate >= 3:
            arr_svc_dil = np.asarray(svc_dil.array) > 0
            inf_limit_svc = int(np.min(np.where(arr_svc_dil)[0]))
            dilate_ax += 1
        if dilate > 30:
            break

    label_overlap = label_ra.with_array(jnp.asarray(label_overlap_arr.astype(np.uint8)))
    intersect_loc = get_com(label_overlap)

    # region at least 10mm inside the whole heart
    potential_san_region = binary_erode(label_wholeheart, (10, 10, 0))
    arr_potential = np.asarray(potential_san_region.array) > 0

    # distance (on the inferior SVC slice) from the intersection point
    spacing_yx = (label_ra.spacing[1], label_ra.spacing[0])
    point_mask = np.zeros(arr_ra.shape[1:], bool)
    point_mask[intersect_loc[1], intersect_loc[2]] = True
    dist2d = ndimage.distance_transform_edt(~point_mask, sampling=spacing_yx)

    yloc, xloc = np.where(arr_potential[inf_limit_svc, :, :])
    if yloc.size == 0:
        yloc, xloc = np.array([intersect_loc[1]]), np.array([intersect_loc[2]])
    distances = dist2d[yloc, xloc]
    location_of_min = distances.argmin()

    sphere_centre = (inf_limit_svc, int(yloc[location_of_min]), int(xloc[location_of_min]))
    label_san = insert_sphere_image(
        label_ra.with_array(jnp.zeros_like(label_ra.array)),
        sp_radius=radius_mm, sp_centre=sphere_centre,
    )

    return paste(template_img, label_san, label_san.size, (0, 0, 0), cb_index)


def _erode_2d_until_disjoint(a2d: np.ndarray, b2d: np.ndarray):
    """Erode ``a2d`` until it no longer overlaps ``b2d`` (reference :196-227)."""
    erode = 1
    a = a2d.copy()
    while (a & b2d).sum() > 0 and a.any():
        a = ndimage.binary_erosion(a, iterations=erode)
        erode += 1
        if erode > 25:
            break
    return a


def geometric_atrioventricularnode(label_la: Image, label_lv: Image, label_ra: Image,
                                   label_rv: Image, radius_mm: float = 10) -> Image:
    """Geometric AVN (reference conduction.py:151-254)."""
    template_img = label_ra.with_array(jnp.zeros(label_ra.spatial_shape, jnp.uint8))
    union = label_ra.with_array(
        (
            (label_la.array > 0) | (label_lv.array > 0)
            | (label_ra.array > 0) | (label_rv.array > 0)
        ).astype(jnp.uint8)
    )
    cb_size, cb_index = label_to_roi(union, expansion_mm=(20, 20, 20))

    label_la = crop_to_roi(label_la, cb_size, cb_index)
    label_lv = crop_to_roi(label_lv, cb_size, cb_index)
    label_ra = crop_to_roi(label_ra, cb_size, cb_index)
    label_rv = crop_to_roi(label_rv, cb_size, cb_index)

    arr_la = np.asarray(label_la.array) > 0
    inf_limit_la = int(np.min(np.where(arr_la)[0]))
    slice_loc = int(inf_limit_la + 10 / label_la.spacing[2])
    slice_loc = min(slice_loc, arr_la.shape[0] - 1)

    la_2d = arr_la[slice_loc]
    lv_2d = np.asarray(label_lv.array)[slice_loc] > 0
    ra_2d = np.asarray(label_ra.array)[slice_loc] > 0
    rv_2d = np.asarray(label_rv.array)[slice_loc] > 0

    # iteratively erode so the chambers do not overlap (reference order)
    lv_2d = _erode_2d_until_disjoint(lv_2d, la_2d)
    la_2d = _erode_2d_until_disjoint(la_2d, ra_2d)
    ra_2d = _erode_2d_until_disjoint(ra_2d, rv_2d)
    rv_2d = _erode_2d_until_disjoint(rv_2d, lv_2d)

    spacing_yx = (label_ra.spacing[1], label_ra.spacing[0])
    y_la, x_la = get_closest_point_2d(rv_2d, la_2d, spacing_yx)
    y_lv, x_lv = get_closest_point_2d(ra_2d, lv_2d, spacing_yx)
    y_ra, x_ra = get_closest_point_2d(lv_2d, ra_2d, spacing_yx)
    y_rv, x_rv = get_closest_point_2d(la_2d, rv_2d, spacing_yx)

    x_location = int(np.mean((x_la, x_lv, x_ra, x_rv)))
    y_location = int(np.mean((y_la, y_lv, y_ra, y_rv)))

    sphere_centre = (slice_loc, y_location, x_location)
    label_avn = insert_sphere_image(
        label_ra.with_array(jnp.zeros_like(label_ra.array)),
        sp_radius=radius_mm, sp_centre=sphere_centre,
    )

    return paste(template_img, label_avn, label_avn.size, (0, 0, 0), cb_index)
