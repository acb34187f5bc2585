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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.distance import polyline_distance2
from platipy_tpu.core.image import Image

logger = logging.getLogger(__name__)

__all__ = [
    "com_from_image_list",
    "com_from_probability",
    "fused_vessel_probability",
    "spline_centreline",
    "tube_mask_from_points",
    "vessel_spline_generation",
    "tube_from_com_list",
    "simpleitk_image_from_vtk_tube",
    "write_vtk_tube_to_file",
    "convert_simpleitk_to_vtk",
]


def _slice_com_stats_np(volume_array, scan_direction):
    """Per-slice (com_a_sum, com_b_sum, weight, any) along the scan axis.

    z direction: a=x, b=y summed over (y, x) per z slice.
    x direction: a=z, b=y summed over (z, y) per x slice.
    Matches the reference's mgrid formulation (vessel.py:74-101,138-163).
    """
    if scan_direction == "z":
        nz, ny, nx = volume_array.shape
        x = np.arange(nx, dtype=np.float64)[None, None, :]
        y = np.arange(ny, dtype=np.float64)[None, :, None]
        com_a = (x * volume_array).sum(axis=(1, 2))
        com_b = (y * volume_array).sum(axis=(1, 2))
        w = volume_array.sum(axis=(1, 2), dtype=np.float64)
        cnt = np.any(volume_array, axis=(1, 2))
    else:
        nz, ny, nx = volume_array.shape
        z = np.arange(nz, dtype=np.float64)[:, None, None]
        y = np.arange(ny, dtype=np.float64)[None, :, None]
        com_a = (z * volume_array).sum(axis=(0, 1))
        com_b = (y * volume_array).sum(axis=(0, 1))
        w = volume_array.sum(axis=(0, 1), dtype=np.float64)
        cnt = np.any(volume_array, axis=(0, 1))
    return com_a, com_b, w, cnt


@functools.partial(jax.jit, static_argnames=("scan_z",))
def _slice_com_stats_jit(stack, *, scan_z):
    """Batched per-slice COM sums on device: [N, n_slices, 4] of
    (com_a_sum, com_b_sum, weight, any>0) — the host formulation pulled every
    full atlas volume over the device link (~0.2 s each on a full-FOV crop)."""
    v = stack.astype(jnp.float32)
    n, nz, ny, nx = v.shape
    if scan_z:
        a = jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 2)[None]
        b = jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 1)[None]
        axes = (2, 3)
    else:
        a = jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 0)[None]
        b = jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 1)[None]
        axes = (1, 2)
    com_a = jnp.sum(a * v, axis=axes)
    com_b = jnp.sum(b * v, axis=axes)
    w = jnp.sum(v, axis=axes)
    cnt = jnp.any(v > 0, axis=axes).astype(jnp.float32)
    return jnp.stack([com_a, com_b, w, cnt], axis=-1)


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
    matching the reference's VTK workaround.  The per-slice sums run as ONE
    batched device program when the masks live on device and share a grid
    (only [N, n_slices, 4] statistics cross to the host).

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
    scan = scan_direction.lower()
    if scan not in ("x", "z"):
        raise ValueError("scan_direction must be 'x' or 'z'")
    if condition_type.lower() not in ("area", "count"):
        raise ValueError(
            "Invalid condition type, please select from 'area' or 'count'."
        )
    nan_combine = np.nanmean if combine == "mean" else np.nanmedian
    reference_image = image_list[0]
    origin = np.asarray(reference_image.origin)
    spacing = np.asarray(reference_image.spacing)

    def phys(idx_xyz):
        return origin + spacing * np.asarray(idx_xyz, dtype=np.float64)

    def quant(v):
        return float(v) if subvoxel else int(v)

    arrays = [img.array for img in image_list]
    shapes = {tuple(a.shape) for a in arrays}
    if len(shapes) == 1 and all(isinstance(a, jax.Array) for a in arrays):
        stats = np.asarray(
            _slice_com_stats_jit(jnp.stack(arrays), scan_z=(scan == "z"))
        ).astype(np.float64)
        com_a_sums = stats[..., 0]
        com_b_sums = stats[..., 1]
        weight_arr = stats[..., 2]
        count_arr = stats[..., 3] > 0
    else:
        per = [_slice_com_stats_np(np.asarray(a), scan) for a in arrays]
        com_a_sums = np.stack([p[0] for p in per])
        com_b_sums = np.stack([p[1] for p in per])
        weight_arr = np.stack([p[2] for p in per])
        count_arr = np.stack([p[3] for p in per])

    with np.errstate(divide="ignore", invalid="ignore"):
        com_a_list = com_a_sums / weight_arr
        com_b_list = com_b_sums / weight_arr
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        mean_com_a = nan_combine(com_a_list, axis=0)
        mean_com_b = nan_combine(com_b_list, axis=0)
        if condition_type.lower() == "area":
            cond = np.sum(weight_arr, axis=0) > condition_value
        else:
            cond = np.sum(count_arr, axis=0) > condition_value
        mean_com = np.dstack((mean_com_a, mean_com_b))[0] * np.array((cond,) * 2).T

    # com[0] is the a-sum (x for z-scan, z for x-scan), com[1] the b-sum (y)
    point_array = []
    for index, com in enumerate(mean_com):
        if np.all(np.isfinite(com)) and np.all(com > 0):
            if scan == "z":
                point_array.append(phys((quant(com[0]), quant(com[1]), index)))
            else:
                point_array.append(phys((index, quant(com[1]), quant(com[0]))))
    return point_array


def fused_vessel_probability(
    reference_image: Image,
    atlas_set: Dict,
    vessel_name: str,
    atlas_label: str = "DIR",
    vote_type: str = "local",
    vote_params: Dict = None,
):
    """Intensity-weighted fused probability of a vessel across atlases.

    EXTENSION (no reference equivalent — the reference estimates each slice
    COM from unweighted binary atlas masks, vessel.py:74-101).  Weighting
    each atlas's mask voxels by local intensity agreement with the target CT
    (the same Gaussian-weighted-voting maps label fusion uses,
    reference fusion.py:100-140) suppresses the locally mis-registered
    atlases that bias the per-slice COM statistics; on the benchmark phantom
    this cuts the median-combined centreline error from ~0.8 mm to ~0.4 mm
    (tube DSC 0.89 -> 0.95).

    Returns the fused probability as an ``Image`` on the reference grid.
    """
    from platipy_tpu.label.fusion import compute_weight_map

    ids = [i for i in atlas_set.keys()
           if vessel_name in atlas_set[i].get(atlas_label, {})]
    if not ids:
        raise ValueError(f"No atlas carries {atlas_label}/{vessel_name}")
    w_stack = jnp.stack([
        compute_weight_map(
            reference_image, atlas_set[i][atlas_label]["CT Image"],
            vote_type=vote_type, vote_params=vote_params,
        ).array
        for i in ids
    ])
    v_stack = jnp.stack([
        atlas_set[i][atlas_label][vessel_name].array.astype(jnp.float32)
        for i in ids
    ])
    prob = _fused_probability_jit(w_stack, v_stack)
    return reference_image.with_array(prob)


@jax.jit
def _fused_probability_jit(w_stack, v_stack):
    return jnp.sum(w_stack * v_stack, axis=0) / (jnp.sum(w_stack, axis=0) + 1e-9)


def com_from_probability(
    probability_image: Image,
    scan_direction: str = "z",
    prob_threshold: float = 0.5,
    min_mass: float = 2.0,
    return_masses: bool = False,
):
    """Per-slice probability-weighted COM points of a fused vessel map.

    EXTENSION (see :func:`fused_vessel_probability`).  Each slice's COM is
    the mass-weighted centroid of ``prob * (prob > prob_threshold)``; slices
    whose surviving mass is ``<= min_mass`` (in probability-weighted voxels)
    are dropped — the analogue of the binary path's count/area stop
    condition.  The per-slice sums run as ONE device program; only the
    [n_slices, 4] statistics cross to the host.

    ``return_masses=True`` additionally returns each surviving slice's mass
    (for confidence-weighted spline fitting: low-mass END slices of a vessel
    — where few atlases still reach after warping — carry noisy COMs but
    anchor the tube's true extent).
    """
    scan = scan_direction.lower()
    if scan not in ("x", "z"):
        raise ValueError("scan_direction must be 'x' or 'z'")
    origin = np.asarray(probability_image.origin)
    spacing = np.asarray(probability_image.spacing)
    arr = probability_image.array
    if isinstance(arr, jax.Array):
        masked = _threshold_mask_prob_jit(arr, prob_threshold)
    else:
        a = np.asarray(arr, np.float32)
        masked = jnp.asarray(a * (a > prob_threshold))
    stats = np.asarray(
        _slice_com_stats_jit(masked[None], scan_z=(scan == "z"))
    ).astype(np.float64)[0]
    com_a, com_b, w = stats[:, 0], stats[:, 1], stats[:, 2]
    point_array, masses = [], []
    for index in range(stats.shape[0]):
        if w[index] <= min_mass:
            continue
        a_idx = com_a[index] / w[index]
        b_idx = com_b[index] / w[index]
        if scan == "z":
            idx_xyz = (a_idx, b_idx, index)
        else:
            idx_xyz = (index, b_idx, a_idx)
        point_array.append(origin + spacing * np.asarray(idx_xyz, np.float64))
        masses.append(float(w[index]))
    if return_masses:
        return point_array, masses
    return point_array


@jax.jit
def _threshold_mask_prob_jit(arr, thr):
    a = arr.astype(jnp.float32)
    return a * (a > thr)


def spline_centreline(
    points, samples_per_segment: int = 10, smoothing: float = 0.0,
    weights=None,
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

    ``weights`` (EXTENSION; only used when ``smoothing > 0``): per-point
    confidence for the smoothing fit — e.g. the per-slice fused probability
    masses from :func:`com_from_probability`, whose low-mass vessel END
    slices carry noisy COMs but anchor the true extent.  Normalised so the
    mean-1 budget semantics of ``smoothing`` are preserved.
    """
    pts = np.asarray(points, dtype=np.float64)
    w = None if weights is None else np.asarray(weights, np.float64)
    if pts.shape[0] < 2:
        return pts
    chord = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=1))])
    if chord[-1] == 0:
        return pts[:1]
    u = chord / chord[-1]
    # drop duplicate parameter values
    keep = np.concatenate([[True], np.diff(u) > 1e-12])
    u, pts = u[keep], pts[keep]
    if w is not None:
        w = w[keep]
    if pts.shape[0] < 2:
        return pts
    n = samples_per_segment * pts.shape[0]
    if smoothing > 0:
        if pts.shape[0] > 3:
            from scipy.interpolate import splev, splprep

            kw = {}
            if w is not None:
                # splprep residual: sum (w_i * r_i)^2 <= s — sqrt so point
                # variance scales inversely with mass, mean-normalised to
                # keep the per-point budget comparable to the unweighted fit
                w_fit = np.sqrt(np.maximum(w, 1e-9))
                kw["w"] = w_fit / max(w_fit.mean(), 1e-12)
            tck, _ = splprep(pts.T, u=u, s=smoothing * pts.shape[0], k=3, **kw)
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


def _extend_centreline(ctr: np.ndarray, lo_val: float, hi_val: float,
                       axis_idx: int) -> np.ndarray:
    """Linearly extend a sampled centreline along its end tangents until its
    scan-axis coordinate reaches ``lo_val`` / ``hi_val`` (EXTENSION — used by
    ``end_trim``: the trimmed noisy end slices still anchor the observed
    vessel extent, which the straight extension recovers)."""
    if ctr.shape[0] < 2:
        return ctr
    segs = [ctr]
    d0 = ctr[0] - ctr[1]
    if abs(d0[axis_idx]) > 1e-9:
        t = (lo_val - ctr[0][axis_idx]) / d0[axis_idx]
        if t > 0:
            segs.insert(0, np.linspace(ctr[0] + d0 * t, ctr[0], 8,
                                       endpoint=False))
    d1 = ctr[-1] - ctr[-2]
    if abs(d1[axis_idx]) > 1e-9:
        t = (hi_val - ctr[-1][axis_idx]) / d1[axis_idx]
        if t > 0:
            segs.append(np.linspace(ctr[-1] + d1 * t, ctr[-1], 8,
                                    endpoint=False)[::-1])
    return np.concatenate(segs)


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
    com_source: str = "binary",
    prob_threshold: float = 0.5,
    vote_params: Dict = None,
    end_trim: int = 0,
    clip_to_extent: bool = False,
) -> Dict[str, Image]:
    """Generate splined vessels from per-atlas masks (reference vessel.py:336-435).

    ``com_combine``: how the per-slice atlas COMs are combined — "mean"
    (reference behaviour) or "median" (robust extension, see
    :func:`com_from_image_list`).  ``spline_smoothing``: smoothing-spline
    residual budget in mm² per point, 0 = reference-equivalent interpolation
    (see :func:`spline_centreline`).

    ``com_source``: "binary" (reference behaviour — per-slice COMs of the
    binary atlas masks, combined across atlases) or "fused_probability"
    (EXTENSION — per-slice COMs of the intensity-weighted fused probability,
    see :func:`fused_vessel_probability`; ``prob_threshold`` gates which
    voxels contribute, ``vote_params`` tunes the local weight maps — a
    sharper sigma≈1.0 measurably beats the fusion default 2.0 for thin
    structures — and the binary path's stop condition maps to a fused-mass
    minimum of ``stop_condition_value``).

    ``end_trim`` (EXTENSION; default 0 = reference behaviour): exclude the
    N outermost COM slices at each end from the spline FIT — end slices are
    estimated from the fewest well-registered atlases and carry the largest
    COM noise — while a straight extension along the fitted end tangents
    recovers the full observed extent.  ``clip_to_extent`` (EXTENSION;
    default False): zero the rasterised tube beyond the COM chain's extent
    along the scan axis, removing the hemispherical end caps the
    point-to-segment rasterisation otherwise adds past the last observed
    slice."""
    if com_source not in ("binary", "fused_probability"):
        raise ValueError("com_source must be 'binary' or 'fused_probability'")
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

        point_masses = None
        if com_source == "fused_probability":
            prob = fused_vessel_probability(
                reference_image, atlas_set, vessel_name,
                atlas_label=atlas_label, vote_params=vote_params,
            )
            point_array, point_masses = com_from_probability(
                prob,
                scan_direction=scan_direction_dict[vessel_name],
                prob_threshold=prob_threshold,
                min_mass=float(stop_condition_value_dict[vessel_name]),
                return_masses=True,
            )
        else:
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

        scan = scan_direction_dict[vessel_name].lower()
        axis_idx = 2 if scan == "z" else 0  # physical (x,y,z) coordinate
        fit_pts, fit_w = point_array, point_masses
        lo_val = hi_val = None
        if len(point_array):
            lo_val = float(point_array[0][axis_idx])
            hi_val = float(point_array[-1][axis_idx])
        if end_trim and len(point_array) > 2 * end_trim + 4:
            fit_pts = point_array[end_trim:-end_trim]
            if point_masses is not None:
                fit_w = point_masses[end_trim:-end_trim]
        centreline = spline_centreline(fit_pts, smoothing=spline_smoothing,
                                       weights=fit_w)
        if end_trim and lo_val is not None and len(centreline) >= 2:
            centreline = _extend_centreline(np.asarray(centreline),
                                            lo_val, hi_val, axis_idx)

        vessel_delineation = tube_mask_from_points(
            centreline, vessel_radius_mm_dict[vessel_name], image_list[0]
        )
        if clip_to_extent and lo_val is not None:
            ref0 = image_list[0]
            origin_c = float(ref0.origin[axis_idx])
            sp_c = float(ref0.spacing[axis_idx])
            i_lo = int(round((lo_val - origin_c) / sp_c))
            i_hi = int(round((hi_val - origin_c) / sp_c))
            arr = np.array(vessel_delineation.array)  # owned, writable copy
            arr_axis = 0 if scan == "z" else 2  # [z,y,x] array axis
            sl = [slice(None)] * 3
            sl[arr_axis] = slice(0, max(i_lo, 0))
            arr[tuple(sl)] = 0
            sl[arr_axis] = slice(i_hi + 1, None)
            arr[tuple(sl)] = 0
            vessel_delineation = vessel_delineation.with_array(
                jnp.asarray(arr))
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
