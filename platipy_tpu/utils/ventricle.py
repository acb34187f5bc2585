"""AHA 17-segment left-ventricle model
(reference: platipy/imaging/utils/ventricle.py:30-685).

Pipeline: crop -> principal-axis cardiac alignment -> iterative MV-to-apex
long-axis refinement -> myocardium shell (outer erosion) -> thirds split ->
polar-angle sector extraction per slice -> inverse rotation + paste back.
The slice-wise polar geometry runs host-side on the cropped volumes (tiny);
rotations/morphology run through the on-device resampler/EDT kernels.
"""

from __future__ import annotations

import copy
from typing import Dict

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_NEAREST
from platipy_tpu.core.morphology import binary_closing, binary_dilate, binary_erode
from platipy_tpu.core.resample import resample
from platipy_tpu.core.transform import MatrixTransform, VersorRigid3DTransform
from platipy_tpu.label.utils import get_com
from platipy_tpu.utils.crop import crop_to_roi, label_to_roi, paste
from platipy_tpu.utils.geometry import vector_angle
from platipy_tpu.utils.valve import generate_valve_using_cylinder

__all__ = ["extract", "generate_left_ventricle_segments"]


def extract(
    template_slice_spacing,
    arr_shape,
    angles,
    radii,
    angle_min,
    angle_max,
    loc_x,
    loc_y,
    cw: bool = False,
    radius_min: float = 0,
    min_area_mm2: float = 25,
) -> np.ndarray:
    """Extract a polar sector from a 2-D myocardium slice
    (reference ventricle.py:30-72; array-level variant)."""
    segment_arr = np.zeros(arr_shape, dtype=np.uint8)

    if cw:
        in_segment_condition = (angles <= angle_min) | (angles >= angle_max)
    else:
        in_segment_condition = (angles <= angle_max) & (angles >= angle_min)
    in_segment_condition &= radii >= radius_min

    segment_arr[loc_y[in_segment_condition], loc_x[in_segment_condition]] = 1

    area = segment_arr.sum() * np.prod(template_slice_spacing)
    if area < min_area_mm2:
        segment_arr *= 0
    return segment_arr


def _rotate_labels(working, label_list, transform):
    for label in label_list:
        img = working[label]
        working[label] = resample(
            img, img, transform, interp=INTERP_NEAREST, default_value=0,
            output_dtype=img.array.dtype,
        )


def _versor_transform(rotation_axis, rotation_angle, rotation_centre):
    axis = np.asarray(rotation_axis, dtype=np.float64)
    norm = np.linalg.norm(axis)
    axis = axis / norm if norm > 0 else np.array([1.0, 0, 0])
    versor = axis * np.sin(rotation_angle / 2.0)
    return VersorRigid3DTransform(
        versor=jnp.asarray(versor, jnp.float32),
        translation=jnp.zeros(3),
        center=jnp.asarray(rotation_centre, jnp.float32),
    )


def _com_2d(mask2d: np.ndarray):
    total = mask2d.sum()
    if total == 0:
        return (mask2d.shape[0] / 2, mask2d.shape[1] / 2)
    yy, xx = np.indices(mask2d.shape)
    return ((yy * mask2d).sum() / total, (xx * mask2d).sum() / total)


def generate_left_ventricle_segments(
    contours: Dict[str, Image],
    label_left_ventricle: str = "Ventricle_L",
    label_left_atrium: str = "Atrium_L",
    label_right_ventricle: str = "Ventricle_R",
    label_heart: str = "Heart",
    myocardium_thickness_mm: float = 10,
    hole_fill_mm: float = 3,
    optimiser_tol_degrees: float = 1,
    optimiser_max_iter: int = 10,
    min_area_mm2: float = 50,
    verbose: bool = False,
) -> Dict[str, Image]:
    """Generate the 17 LV segments (reference ventricle.py:75-685)."""
    label_mitral_valve = "MITRALVALVE"
    label_list = [label_left_ventricle, label_left_atrium, label_right_ventricle, label_heart]
    working = copy.deepcopy({s: contours[s] for s in label_list})
    label_list.append(label_mitral_valve)

    output_contours = {}
    overall_transform_list = []

    working[label_mitral_valve] = generate_valve_using_cylinder(
        working[label_left_atrium], working[label_left_ventricle],
        radius_mm=15, height_mm=10,
    )

    erode_img = [
        int(myocardium_thickness_mm / i) for i in working[label_left_ventricle].spacing
    ]
    hole_fill_img = [int(hole_fill_mm / i) for i in working[label_heart].spacing]

    # --- module 1: crop + principal-axis alignment ---------------------------
    cb_size, cb_index = label_to_roi(working[label_heart], expansion_mm=(30, 30, 60))
    for label in label_list:
        working[label] = crop_to_roi(working[label], cb_size, cb_index)

    orient_arr = (
        (np.asarray(working[label_left_ventricle].array) > 0)
        | (np.asarray(working[label_left_atrium].array) > 0)
    )
    label_orient = working[label_left_ventricle].with_array(
        jnp.asarray(orient_arr.astype(np.uint8))
    )

    # first principal axis (smallest moment) in physical (x,y,z)
    zz, yy, xx = np.nonzero(orient_arr)
    spacing = np.asarray(label_orient.spacing)
    phys = np.stack([xx * spacing[0], yy * spacing[1], zz * spacing[2]], axis=1)
    phys = phys - phys.mean(axis=0, keepdims=True)
    cov = phys.T @ phys / phys.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    cardiac_axis = evecs[:, -1]  # largest-variance axis ~ long axis (x,y,z)

    # reference convention: axis from GetPrincipalAxes is (z,y,x); it checks
    # component [2] (x there). Here we have (x,y,z); ensure z-component
    # convention matches the reference's base->apex check.
    cardiac_axis_zyx = cardiac_axis[::-1]
    if cardiac_axis_zyx[2] < 0:
        cardiac_axis_zyx = -1 * cardiac_axis_zyx

    rotation_angle = vector_angle(cardiac_axis_zyx[::-1], (0, 0, 1))
    rotation_axis = np.cross(cardiac_axis_zyx[::-1], (0, 0, 1))
    rotation_centre = get_com(label_orient, real_coords=True)

    tfm = _versor_transform(rotation_axis, rotation_angle, rotation_centre)
    overall_transform_list.append(tfm)
    _rotate_labels(working, label_list, tfm)

    # --- module 2: iterative long-axis refinement -----------------------------
    optimiser_tol_radians = optimiser_tol_degrees * np.pi / 180
    n = 0
    while n < optimiser_max_iter and np.abs(rotation_angle) > optimiser_tol_radians:
        n += 1
        lv_arr = np.asarray(working[label_left_ventricle].array) > 0
        if not lv_arr.any():
            break
        lv_locations = np.where(lv_arr)
        lv_apex_z = lv_locations[0].min()
        lv_apex_y = lv_locations[1][lv_locations[0] == lv_apex_z].mean()
        lv_apex_x = lv_locations[2][lv_locations[0] == lv_apex_z].mean()

        mv_com = np.array(get_com(working[label_mitral_valve], real_coords=True))
        lv_apex_loc_img = np.array(
            working[label_left_ventricle].physical_point(
                (lv_apex_x, lv_apex_y, lv_apex_z)
            )
        )
        lv_axis = lv_apex_loc_img - mv_com

        rotation_axis = np.cross(lv_axis, (0, 0, 1))
        rotation_angle = vector_angle(lv_axis, (0, 0, 1))
        rotation_centre = 0.5 * (mv_com + lv_apex_loc_img)

        tfm = _versor_transform(rotation_axis, rotation_angle, rotation_centre)
        overall_transform_list.append(tfm)
        _rotate_labels(working, label_list, tfm)

        if verbose:
            print(f"  iter {n}: angle {rotation_angle:.4f} rad")

    # --- module 3: myocardium + thirds ----------------------------------------
    label_lv_inner = binary_erode(working[label_left_ventricle], erode_img)
    lv_arr = np.asarray(working[label_left_ventricle].array) > 0
    inner_arr = np.asarray(label_lv_inner.array) > 0
    myo_arr = lv_arr & ~inner_arr

    myo_mask = np.asarray(binary_dilate(label_lv_inner, erode_img).array) > 0
    myo_arr = myo_arr & myo_mask

    if inner_arr.any():
        inf_limit_lv = int(np.where(inner_arr)[0].min())
    else:
        inf_limit_lv = int(np.where(lv_arr)[0].min()) if lv_arr.any() else 0

    com_mv = get_com(working[label_mitral_valve])[0]

    extent = com_mv - inf_limit_lv
    dc = int(extent / 3)
    apical_extent = inf_limit_lv + dc
    mid_extent = inf_limit_lv + 2 * dc
    basal_extent = com_mv

    nz, ny, nx = myo_arr.shape
    label_lv_myo_apex = myo_arr.copy()
    label_lv_myo_apex[inf_limit_lv:, :, :] = 0

    segments = {i + 1: np.zeros_like(myo_arr, dtype=np.uint8) for i in range(17)}
    segments[17] = label_lv_myo_apex.astype(np.uint8)

    # --- module 4: polar sector extraction ------------------------------------
    rv_arr = np.asarray(working[label_right_ventricle].array) > 0
    loc_rv = np.where(rv_arr)

    spacing2d = (
        working[label_heart].spacing[0],
        working[label_heart].spacing[1],
    )

    # basal RV insertion angle
    theta_rv_insertion = []
    for z in range(mid_extent, min(mid_extent + 5, nz)):
        sel = loc_rv[0] == z
        if not sel.any():
            continue
        loc_rv_basal_x = loc_rv[2][sel]
        loc_rv_basal_y = loc_rv[1][sel]
        lv_com = _com_2d(lv_arr[z])
        theta_rv = np.arctan2(lv_com[0] - loc_rv_basal_y, loc_rv_basal_x - lv_com[1])
        theta_rv[theta_rv < 0] += 2 * np.pi
        theta_rv_insertion.append(theta_rv.min())
    theta_0 = np.median(theta_rv_insertion) if theta_rv_insertion else 0.0

    # apical LV-RV COM angle
    lv_com_apical_list, rv_com_apical_list = [], []
    for z in range(inf_limit_lv, apical_extent):
        lv_com_apical_list.append(_com_2d(lv_arr[z]))
        rv_com_apical_list.append(_com_2d(rv_arr[z]))
    if lv_com_apical_list:
        lv_com_apical = np.mean(lv_com_apical_list, axis=0)
        rv_com_apical = np.mean(rv_com_apical_list, axis=0)
        theta_0_apical = np.arctan2(
            lv_com_apical[0] - rv_com_apical[0], rv_com_apical[1] - lv_com_apical[1]
        )
    else:
        theta_0_apical = 0.0

    def polar(slice_arr, theta_offset):
        loc_y, loc_x = np.where(slice_arr)
        y_0, x_0 = _com_2d(slice_arr)
        theta = -np.arctan2(loc_y - y_0, loc_x - x_0) - theta_offset
        theta[theta < 0] += 2 * np.pi
        radii = np.sqrt((loc_y - y_0) ** 2 + (loc_x - x_0) ** 2)
        return theta, radii, loc_x, loc_y

    # apical segments 13-16
    for z in range(inf_limit_lv, apical_extent):
        sl = myo_arr[z]
        if not sl.any():
            continue
        theta, radii, loc_x, loc_y = polar(sl, theta_0_apical)
        args = dict(min_area_mm2=min_area_mm2)
        segments[13][z] = extract(spacing2d, sl.shape, theta, radii,
                                  5 * np.pi / 4, 7 * np.pi / 4, loc_x, loc_y, **args)
        segments[14][z] = extract(spacing2d, sl.shape, theta, radii,
                                  1 * np.pi / 4, 7 * np.pi / 4, loc_x, loc_y, cw=True, **args)
        segments[15][z] = extract(spacing2d, sl.shape, theta, radii,
                                  1 * np.pi / 4, 3 * np.pi / 4, loc_x, loc_y, **args)
        segments[16][z] = extract(spacing2d, sl.shape, theta, radii,
                                  3 * np.pi / 4, 5 * np.pi / 4, loc_x, loc_y, **args)

    # mid segments 7-12
    mid_ranges = [
        (8, 0, np.pi / 3), (9, np.pi / 3, 2 * np.pi / 3),
        (10, 2 * np.pi / 3, np.pi), (11, np.pi, 4 * np.pi / 3),
        (12, 4 * np.pi / 3, 5 * np.pi / 3), (7, 5 * np.pi / 3, 2 * np.pi),
    ]
    for z in range(apical_extent, mid_extent):
        sl = myo_arr[z]
        if not sl.any():
            continue
        theta, radii, loc_x, loc_y = polar(sl, theta_0)
        for seg, a0, a1 in mid_ranges:
            segments[seg][z] = extract(spacing2d, sl.shape, theta, radii,
                                       a0, a1, loc_x, loc_y, min_area_mm2=min_area_mm2)

    # basal segments 1-6 (radius_min=15)
    basal_ranges = [
        (2, 0, np.pi / 3), (3, np.pi / 3, 2 * np.pi / 3),
        (4, 2 * np.pi / 3, np.pi), (5, np.pi, 4 * np.pi / 3),
        (6, 4 * np.pi / 3, 5 * np.pi / 3), (1, 5 * np.pi / 3, 2 * np.pi),
    ]
    for z in range(mid_extent, min(basal_extent, nz)):
        sl = myo_arr[z]
        if not sl.any():
            continue
        theta, radii, loc_x, loc_y = polar(sl, theta_0)
        for seg, a0, a1 in basal_ranges:
            segments[seg][z] = extract(spacing2d, sl.shape, theta, radii,
                                       a0, a1, loc_x, loc_y, radius_min=15,
                                       min_area_mm2=min_area_mm2)

    # --- module 5: inverse rotation + paste back ------------------------------
    # sequential resampling through T1..Tn gives final(x) = orig(T1(T2(...Tn(x)))),
    # i.e. total = M1 @ M2 @ ... @ Mn (the ITK composite of the same list)
    total = np.eye(4)
    for t in overall_transform_list:
        total = total @ t.as_matrix()
    inverse = MatrixTransform(jnp.asarray(np.linalg.inv(total), jnp.float32))

    template = contours[label_heart].with_array(
        jnp.zeros(contours[label_heart].spatial_shape, jnp.uint8)
    )
    cropped_grid = working[label_heart]

    for segment in range(17):
        seg_img = cropped_grid.with_array(jnp.asarray(segments[segment + 1]))
        new_structure = resample(
            seg_img, seg_img, inverse, interp=INTERP_NEAREST, default_value=0,
            output_dtype=jnp.uint8,
        )
        if hole_fill_mm > 0:
            new_structure = binary_closing(new_structure, hole_fill_img)
        new_structure = paste(
            template, new_structure, new_structure.size, (0, 0, 0), cb_index
        )
        output_contours[f"Ventricle_L_Segment{segment + 1}"] = new_structure

    return output_contours
