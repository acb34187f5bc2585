"""Vessel splining — VTK-free spline + tube rasterisation.

Rebuild of platipy/imaging/utils/vessel.py:33-435, which delegated to VTK
(vtkParametricSpline -> vtkTubeFilter -> vtkPolyDataToImageStencil).  Here:

* slice-wise mean COM across atlas masks (same formulas, vessel.py:33-167);
* a chord-length-parameterised natural cubic spline through the COM points
  (scipy CubicSpline = the vtkCardinalSpline behaviour), sampled densely;
* tube voxelisation as distance-to-centreline <= radius via the bounded
  on-device EDT (replacing polydata stencilling — same geometry, no mesh).

The reference's direction-identity workaround (vessel.py:393-434, needed
because VTK images cannot carry directions) is reproduced by doing all the
geometry in identity-direction space and reattaching the original direction.
"""

from __future__ import annotations

import logging
import warnings
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.distance import polyline_distance2
from platipy_tpu.core.image import Image

logger = logging.getLogger(__name__)

__all__ = [
    "com_from_image_list",
    "spline_centreline",
    "tube_mask_from_points",
    "vessel_spline_generation",
    "tube_from_com_list",
    "simpleitk_image_from_vtk_tube",
    "write_vtk_tube_to_file",
    "convert_simpleitk_to_vtk",
]


def com_from_image_list(
    image_list: List[Image],
    condition_type: str = "count",
    condition_value: float = 0,
    scan_direction: str = "z",
    subvoxel: bool = True,
    combine: str = "mean",
):
    """Mean slice-wise COM positions across masks (reference vessel.py:33-167).

    Physical points are computed with IDENTITY direction (origin + spacing*idx),
    matching the reference's VTK workaround.

    ``subvoxel=True`` (default) keeps the slice COMs at full float precision.
    DOCUMENTED DIVERGENCE: the reference truncates each COM to int before
    ``TransformIndexToPhysicalPoint`` (reference vessel.py:98-101,160-163),
    quantising the centreline by up to one voxel; pass ``subvoxel=False`` for
    bit-identical reference behaviour.

    ``combine="median"`` (DOCUMENTED EXTENSION; default "mean" = reference)
    takes the per-slice MEDIAN of the atlas COMs instead of the mean: robust
    to the one-or-two poorly registered atlases that drag a mean centreline
    sideways (measured +0.03 tube DSC on the benchmark phantom).
    """
    if combine not in ("mean", "median"):
        raise ValueError("combine must be 'mean' or 'median'")
    nan_combine = np.nanmean if combine == "mean" else np.nanmedian
    reference_image = image_list[0]
    origin = np.asarray(reference_image.origin)
    spacing = np.asarray(reference_image.spacing)

    def phys(idx_xyz):
        return origin + spacing * np.asarray(idx_xyz, dtype=np.float64)

    def quant(v):
        return float(v) if subvoxel else int(v)

    if scan_direction.lower() == "x":
        ref_arr = np.asarray(reference_image.array)
        z, y = np.mgrid[0 : ref_arr.shape[0] : 1, 0 : ref_arr.shape[1] : 1]
        com_z_list, com_y_list, weight_list, count_list = [], [], [], []
        with np.errstate(divide="ignore", invalid="ignore"):
            for img in image_list:
                volume_array = np.asarray(img.array)
                com_z = 1.0 * (z[:, :, np.newaxis] * volume_array).sum(axis=(1, 0))
                com_y = 1.0 * (y[:, :, np.newaxis] * volume_array).sum(axis=(1, 0))
                weights = np.sum(volume_array, axis=(1, 0))
                weight_list.append(weights)
                count_list.append(np.any(volume_array, axis=(1, 0)))
                com_z_list.append(com_z / (1.0 * weights))
                com_y_list.append(com_y / (1.0 * weights))

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            mean_com_z = nan_combine(com_z_list, axis=0)
            mean_com_y = nan_combine(com_y_list, axis=0)
            if condition_type.lower() == "area":
                cond = np.sum(weight_list, axis=0) > condition_value
            elif condition_type.lower() == "count":
                cond = np.sum(count_list, axis=0) > condition_value
            else:
                raise ValueError(
                    "Invalid condition type, please select from 'area' or 'count'."
                )
            mean_com = np.dstack((mean_com_z, mean_com_y))[0] * np.array((cond,) * 2).T

        point_array = []
        for index, com in enumerate(mean_com):
            if np.all(np.isfinite(com)) and np.all(com > 0):
                point_array.append(phys((index, quant(com[1]), quant(com[0]))))
        return point_array

    if scan_direction.lower() == "z":
        ref_arr = np.asarray(reference_image.array)
        x, y = np.mgrid[0 : ref_arr.shape[1] : 1, 0 : ref_arr.shape[2] : 1]
        com_x_list, com_y_list, weight_list, count_list = [], [], [], []
        with np.errstate(divide="ignore", invalid="ignore"):
            for img in image_list:
                volume_array = np.asarray(img.array)
                com_x = 1.0 * (x * volume_array).sum(axis=(1, 2))
                com_y = 1.0 * (y * volume_array).sum(axis=(1, 2))
                weights = np.sum(volume_array, axis=(1, 2))
                weight_list.append(weights)
                count_list.append(np.any(volume_array, axis=(1, 2)))
                com_x_list.append(com_x / (1.0 * weights))
                com_y_list.append(com_y / (1.0 * weights))

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            mean_com_x = nan_combine(com_x_list, axis=0)
            mean_com_y = nan_combine(com_y_list, axis=0)
            if condition_type.lower() == "area":
                cond = np.sum(weight_list, axis=0) > condition_value
            elif condition_type.lower() == "count":
                cond = np.sum(count_list, axis=0) > condition_value
            else:
                raise ValueError(
                    "Invalid condition type, please select from 'area' or 'count'."
                )
            mean_com = np.dstack((mean_com_x, mean_com_y))[0] * np.array((cond,) * 2).T

        point_array = []
        for index, com in enumerate(mean_com):
            if np.all(np.isfinite(com)) and np.all(com > 0):
                point_array.append(phys((quant(com[1]), quant(com[0]), index)))
        return point_array

    raise ValueError("scan_direction must be 'x' or 'z'")


def spline_centreline(
    points, samples_per_segment: int = 10, smoothing: float = 0.0
) -> np.ndarray:
    """Natural cubic spline through physical points, chord-length parameterised
    (the vtkParametricSpline behaviour, vessel.py:176-188).

    ``smoothing`` (DOCUMENTED EXTENSION; default 0 = reference-equivalent
    interpolation) fits a smoothing B-spline instead, with scipy ``splprep``
    residual budget ``s = smoothing * n_points`` (mm² per point): the
    per-slice COM estimates carry registration noise that an interpolating
    spline reproduces wiggle-for-wiggle, while a small residual budget
    (~0.5-2 mm² per point) recovers the smooth centreline real vessels have.
    With fewer than 4 distinct points a cubic smoothing spline is
    underdetermined, so the smoothing budget is IGNORED and the function
    falls back to the interpolating spline (logged at debug level).
    """
    pts = np.asarray(points, dtype=np.float64)
    if pts.shape[0] < 2:
        return pts
    chord = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=1))])
    if chord[-1] == 0:
        return pts[:1]
    u = chord / chord[-1]
    # drop duplicate parameter values
    keep = np.concatenate([[True], np.diff(u) > 1e-12])
    u, pts = u[keep], pts[keep]
    if pts.shape[0] < 2:
        return pts
    n = samples_per_segment * pts.shape[0]
    if smoothing > 0:
        if pts.shape[0] > 3:
            from scipy.interpolate import splev, splprep

            tck, _ = splprep(pts.T, u=u, s=smoothing * pts.shape[0], k=3)
            return np.array(splev(np.linspace(0, 1, n), tck)).T
        logger.debug(
            "spline_centreline: smoothing=%s requested but only %d distinct "
            "points — falling back to the interpolating spline", smoothing,
            pts.shape[0],
        )
    from scipy.interpolate import CubicSpline

    cs = CubicSpline(u, pts, axis=0, bc_type="natural")
    return cs(np.linspace(0, 1, n))


def tube_mask_from_points(centreline_points, radius_mm: float, reference_image: Image) -> Image:
    """Voxelise a tube around a polyline: distance-to-centreline <= radius.

    Identity-direction geometry (matching the reference's VTK workaround).
    EXACT point-to-segment distances on device (no centreline voxel
    snapping — seed-voxel EDT stencilling costs up to half a voxel of
    systematic radius error, which on a 2 mm-radius coronary is 25%).
    """
    shape = reference_image.spatial_shape
    pts = np.asarray(centreline_points, dtype=np.float64)
    if pts.size == 0:
        return reference_image.with_array(jnp.zeros(shape, jnp.uint8))

    d2 = polyline_distance2(
        pts, shape, reference_image.origin, reference_image.spacing,
        max_distance_mm=float(radius_mm),
    )
    mask = (d2 <= radius_mm**2).astype(jnp.uint8)
    return reference_image.with_array(mask)


def vessel_spline_generation(
    reference_image: Image,
    atlas_set: Dict,
    vessel_name_list,
    vessel_radius_mm_dict: Dict,
    stop_condition_type_dict: Dict,
    stop_condition_value_dict: Dict,
    scan_direction_dict: Dict,
    atlas_label: str = "DIR",
    com_combine: str = "mean",
    spline_smoothing: float = 0.0,
) -> Dict[str, Image]:
    """Generate splined vessels from per-atlas masks (reference vessel.py:336-435).

    ``com_combine``: how the per-slice atlas COMs are combined — "mean"
    (reference behaviour) or "median" (robust extension, see
    :func:`com_from_image_list`).  ``spline_smoothing``: smoothing-spline
    residual budget in mm² per point, 0 = reference-equivalent interpolation
    (see :func:`spline_centreline`)."""
    splined_vessels = {}

    if isinstance(vessel_name_list, str):
        vessel_name_list = [vessel_name_list]

    for vessel_name in vessel_name_list:
        image_list = []
        for i in atlas_set.keys():
            try:
                image_list.append(atlas_set[i][atlas_label][vessel_name])
            except (KeyError, TypeError):
                logger.warning(
                    "No match for ID=%s, label=%s, vessel=%s", i, atlas_label, vessel_name
                )

        if len(image_list) == 0:
            logger.warning("No structures found for vessel with name %s!", vessel_name)
            continue

        point_array = com_from_image_list(
            image_list,
            condition_type=stop_condition_type_dict[vessel_name],
            condition_value=stop_condition_value_dict[vessel_name],
            scan_direction=scan_direction_dict[vessel_name],
            combine=com_combine,
        )
        if len(point_array) == 0:
            # every slice failed the stop condition — typically a
            # stop_condition_value at or above the number of contributing
            # atlases (IAR may have pruned the set since the settings were
            # written); the delineation below will be EMPTY
            logger.warning(
                "Vessel %s: no centreline points survive the %s>%s condition "
                "over %d atlases — returning an empty delineation",
                vessel_name, stop_condition_type_dict[vessel_name],
                stop_condition_value_dict[vessel_name], len(image_list),
            )
        centreline = spline_centreline(point_array, smoothing=spline_smoothing)

        vessel_delineation = tube_mask_from_points(
            centreline, vessel_radius_mm_dict[vessel_name], image_list[0]
        )
        # reattach the true direction (identity-space geometry, reference :426)
        vessel_delineation = Image(
            vessel_delineation.array,
            image_list[0].origin,
            image_list[0].spacing,
            reference_image.direction,
        )
        splined_vessels[vessel_name] = vessel_delineation

    return splined_vessels


def tube_from_com_list(com_list, radius_mm: float, reference_image: Image = None):
    """Drop-in alias for the reference's ``tube_from_com_list``
    (reference utils/vessel.py:170-214, which builds a vtkParametricSpline +
    vtkTubeFilter).  Here the spline + tube are rasterised directly:
    returns the sampled centreline points; pass ``reference_image`` to get the
    voxelised tube mask instead (covering ``simpleitk_image_from_vtk_tube``,
    reference :235-296, in one step)."""
    pts = spline_centreline(np.asarray(com_list, dtype=np.float64))
    if reference_image is None:
        return pts
    return tube_mask_from_points(pts, radius_mm, reference_image)


def simpleitk_image_from_vtk_tube(tube, reference_image: Image) -> Image:
    """Drop-in alias for the reference's ``simpleitk_image_from_vtk_tube``
    (reference utils/vessel.py:235-296).  ``tube`` is the centreline points
    array returned by :func:`tube_from_com_list` plus a radius attribute, or a
    (points, radius_mm) tuple — VTK polydata does not exist in this framework.
    """
    if isinstance(tube, tuple):
        points, radius_mm = tube
    else:
        points, radius_mm = tube, 2.0
    return tube_mask_from_points(np.asarray(points), float(radius_mm), reference_image)


def write_vtk_tube_to_file(tube, filename, radius_mm: float = 2.0) -> str:
    """Write a tube as a legacy-VTK ASCII POLYDATA file, loadable by
    ParaView/Slicer (reference utils/vessel.py:217-232 writes vtkPolyData).

    ``tube`` is the centreline points array from :func:`tube_from_com_list`
    or a ``(points, radius_mm)`` tuple.  The tube surface is triangulated
    from scratch: a circle of vertices is swept along the centreline in a
    rotation-minimising frame and consecutive rings are stitched into quads.
    """
    if isinstance(tube, tuple):
        points, radius_mm = tube
    points = np.asarray(tube if not isinstance(tube, tuple) else points,
                        dtype=np.float64)
    if points.ndim != 2 or points.shape[0] < 2:
        raise ValueError("tube centreline needs at least two points")

    n_sides = 12
    # rotation-minimising frames along the polyline
    tangents = np.diff(points, axis=0)
    tangents = np.vstack([tangents, tangents[-1:]])
    tangents /= np.maximum(np.linalg.norm(tangents, axis=1, keepdims=True), 1e-12)
    normal = np.cross(tangents[0], [0.0, 0.0, 1.0])
    if np.linalg.norm(normal) < 1e-6:
        normal = np.cross(tangents[0], [0.0, 1.0, 0.0])
    normal /= np.linalg.norm(normal)

    rings = []
    for i, (p, t) in enumerate(zip(points, tangents)):
        # project previous normal off the new tangent (double-reflection lite)
        normal = normal - np.dot(normal, t) * t
        normal /= max(np.linalg.norm(normal), 1e-12)
        binormal = np.cross(t, normal)
        ang = np.linspace(0, 2 * np.pi, n_sides, endpoint=False)
        ring = p + radius_mm * (np.outer(np.cos(ang), normal)
                                + np.outer(np.sin(ang), binormal))
        rings.append(ring)
    verts = np.concatenate(rings)

    polys = []
    for i in range(len(points) - 1):
        for j in range(n_sides):
            a = i * n_sides + j
            b = i * n_sides + (j + 1) % n_sides
            c = (i + 1) * n_sides + (j + 1) % n_sides
            d = (i + 1) * n_sides + j
            polys.append((a, b, c, d))

    with open(filename, "w") as f:
        f.write("# vtk DataFile Version 3.0\nplatipy_tpu tube\nASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {len(verts)} float\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        f.write(f"POLYGONS {len(polys)} {len(polys) * 5}\n")
        for q in polys:
            f.write(f"4 {q[0]} {q[1]} {q[2]} {q[3]}\n")
    return str(filename)


def convert_simpleitk_to_vtk(image: Image, filename=None):
    """Native stand-in for the reference's ``convert_simpleitk_to_vtk``
    (utils/vessel.py:235-260, which builds a vtkImageData): writes/returns a
    legacy-VTK STRUCTURED_POINTS representation of the image.  With
    ``filename`` the ASCII file is written and its path returned; without,
    the header + flat value array are returned as (header_str, np.ndarray).
    """
    arr = np.asarray(image.array, dtype=np.float32)
    nz, ny, nx = arr.shape
    ox, oy, oz = (float(v) for v in image.origin)
    sx, sy, sz = (float(v) for v in image.spacing)
    header = (
        "# vtk DataFile Version 3.0\nplatipy_tpu image\nASCII\n"
        "DATASET STRUCTURED_POINTS\n"
        f"DIMENSIONS {nx} {ny} {nz}\n"
        f"ORIGIN {ox} {oy} {oz}\n"
        f"SPACING {sx} {sy} {sz}\n"
        f"POINT_DATA {arr.size}\nSCALARS values float 1\nLOOKUP_TABLE default\n"
    )
    flat = arr.ravel(order="C")  # z fastest-varying last: VTK x-fastest = C on [z,y,x]
    if filename is None:
        return header, flat
    with open(filename, "w") as f:
        f.write(header)
        f.write("\n".join(f"{v:g}" for v in flat))
        f.write("\n")
    return str(filename)
