"""Surface projection utilities (reference: platipy/imaging/label/projection.py:9-121)."""

from __future__ import annotations

import numpy as np

from platipy_tpu.core.distance import squared_edt
from platipy_tpu.core.image import Image
from platipy_tpu.core.morphology import label_contour
from platipy_tpu.label.utils import vectorised_transform_index_to_physical_point

__all__ = [
    "evaluate_distance_on_surface",
    "evaluate_distance_to_reference",
    "regrid_spherical_data",
]


def _abs_maurer(volume: Image) -> np.ndarray:
    """|signed Maurer| = distance to the mask's inner-boundary voxels."""
    contour = np.asarray(label_contour(volume.array > 0)) > 0
    return np.sqrt(np.asarray(squared_edt(contour, volume.spacing)))


def evaluate_distance_on_surface(
    reference_volume, test_volume: Image, abs_distance: bool = True,
    reference_as_distance_map: bool = False,
):
    """Distance evaluated on the test surface in spherical coords around the
    reference COM; returns (theta, phi, values)."""
    if reference_as_distance_map:
        reference_distance_map = np.asarray(reference_volume.array)
        ref_for_com = reference_volume
    else:
        reference_distance_map = _abs_maurer(reference_volume)
        ref_for_com = reference_volume

    test_surface = np.asarray(label_contour(test_volume.array > 0)) > 0
    distance_array = reference_distance_map * test_surface

    reference_volume_array = np.asarray(ref_for_com.array)
    if reference_as_distance_map:
        # COM of the reference surface: the zero-level shell of the distance
        # map.  (The reference's `arr == 1` [projection.py:42] selects voxels
        # at exactly 1.0 mm — an empty set on non-unit spacing, NaN COM.)
        shell = reference_volume_array <= float(min(ref_for_com.spacing))
        if not shell.any():
            shell = reference_volume_array <= reference_volume_array.min() + 1e-6
        reference_volume_locations = np.array(np.where(shell))
    else:
        reference_volume_locations = np.array(np.where(reference_volume_array == 1))
    com_index = reference_volume_locations.mean(axis=1)
    com_real = vectorised_transform_index_to_physical_point(ref_for_com, com_index)

    test_surface_locations = np.where(test_surface)
    test_surface_locations_array = np.array(test_surface_locations)

    pts = test_surface_locations_array.T
    pts_real = vectorised_transform_index_to_physical_point(test_volume, pts)
    pts_diff = pts_real - com_real

    rho = np.sqrt((pts_diff * pts_diff).sum(axis=1))
    theta = np.pi / 2.0 - np.arccos(pts_diff.T[0] / rho)
    phi = -1 * np.arctan2(pts_diff.T[2], -1.0 * pts_diff.T[1])

    values = distance_array[test_surface_locations]
    return theta, phi, values


def evaluate_distance_to_reference(reference_volume: Image, test_volume: Image,
                                   resample_factor: int = 1) -> np.ndarray:
    """Distance from the test surface, sampled at reference-surface voxels."""
    test_distance_map = _abs_maurer(test_volume)
    ref_surface_pts = np.asarray(label_contour(reference_volume.array > 0)) > 0
    surface_values = test_distance_map[ref_surface_pts]
    return surface_values[::resample_factor]


def regrid_spherical_data(theta, phi, values, resolution):
    """Lat/long regridding: linear interpolation with NN fallback."""
    from scipy.interpolate import griddata

    d_radian = resolution * np.pi / 180
    p_long, p_lat = np.mgrid[
        -np.pi : np.pi : d_radian, -np.pi / 2.0 : np.pi / 2.0 : d_radian
    ]

    grid_values = griddata(
        list(zip(theta, phi)), values, (p_lat, p_long), method="linear", rescale=False
    )
    grid_values_nn = griddata(
        list(zip(theta, phi)), values, (p_lat, p_long), method="nearest", rescale=False
    )
    grid_values[~np.isfinite(grid_values)] = grid_values_nn[~np.isfinite(grid_values)]

    return p_lat, p_long, grid_values
