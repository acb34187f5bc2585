"""Bronchus (proximal bronchial tree) segmentation
(reference: platipy/imaging/projects/bronchus/bronchus.py:38-356).

Heuristic pipeline: lung mask from air-hole connected components, trachea seed
from superior slices by elongation/size, connected-threshold region growing
over an HU sweep with a physical-size acceptance window, carina detection by
2-region split scan, crop above the carina.  Region growing and connected
components run on device; the sweep/selection logic is host-side control flow.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.components import (
    connected_components,
    connected_threshold,
    label_shape_statistics,
    relabel_components,
)
from platipy_tpu.core.filters import median3
from platipy_tpu.core.image import Image
from platipy_tpu.core.morphology import binary_dilate
from platipy_tpu.utils.lung import detect_holes, get_lung_mask

logger = logging.getLogger(__name__)

__all__ = ["fast_mask", "get_distance", "generate_lung_mask", "generate_airway_mask",
           "default_settings"]


def fast_mask(img: Image, start: int, end: int) -> Image:
    """Zero out slices [start:end) along z (reference bronchus.py:38-56)."""
    arr = np.asarray(img.array).astype(float)
    arr[start:end, :, :] = 0
    return img.with_array(jnp.asarray(arr))


def get_distance(a_mask: Image, b_mask: Image) -> float:
    """Nearest signed distance from a_mask's surface over b_mask
    (reference bronchus.py:59-104)."""
    from platipy_tpu.core.distance import signed_maurer_distance_map
    from platipy_tpu.nifti.io import read_image

    if isinstance(a_mask, str):
        a_mask = read_image(a_mask)
    if isinstance(b_mask, str):
        b_mask = read_image(b_mask)

    dist = np.asarray(signed_maurer_distance_map(a_mask).array)
    penalty = (np.asarray(b_mask.array) - 1) * -10000.0
    return float((dist + penalty).min())


def generate_lung_mask(img: Image) -> Image:
    """Initial lung/airway mask (reference bronchus.py:107-124)."""
    logger.info("Generating Lung Mask...")
    label_image, labels = detect_holes(img)
    lung_mask = get_lung_mask(label_image, labels)
    logger.info("Generating Lung Mask... Done")
    return lung_mask


default_settings = {
    "fast_mode": True,
    "extend_from_carina_mm": 40,
    "minimum_tree_half_physical_size": 1000,
    "lung_mask_hu_values": [-750, -775, -800, -825, -850, -900, -700, -950, -650],
    "distance_from_supu_slice_values": [3, 10, 20],
    "expected_physical_size_range": [22000, 150000],
}


def generate_airway_mask(dest, img: Image, lung_mask: Image, config_dict=None) -> Image:
    """Final bronchus segmentation (reference bronchus.py:137-356)."""
    if not config_dict:
        config_dict = default_settings

    fast_mode = config_dict["fast_mode"]
    extend_from_carina_mm = config_dict["extend_from_carina_mm"]
    lung_mask_hu_values = config_dict["lung_mask_hu_values"]
    minimum_tree_half_physical_size = config_dict["minimum_tree_half_physical_size"]
    distance_from_supu_slice_values = config_dict["distance_from_supu_slice_values"]
    expected_physical_size_range = config_dict["expected_physical_size_range"]

    nz = img.spatial_shape[0]
    z_spacing = img.spacing[2]
    extend_from_carina = round(extend_from_carina_mm / z_spacing)

    loop_count = 0
    processed_correctly = False
    best_result = None
    best_result_sim = 0
    best_lung_mask_hu = 0
    best_distance_from_sup_slice = 0

    img_arr = np.asarray(img.array)

    for k in range(2):
        if processed_correctly and fast_mode:
            break
        if k == 1:
            lung_mask = median3(lung_mask)
            lung_mask = lung_mask.with_array(
                (np.asarray(lung_mask.array) > 0.5).astype(np.uint8)
            )

        lung_arr = np.asarray(lung_mask.array) > 0

        for distance_from_sup_slice in distance_from_supu_slice_values:
            if processed_correctly and fast_mode:
                break

            # superior slab: sitk slicing [:, :, hi-10:hi] -> z slab in numpy
            z_lo = nz - distance_from_sup_slice - 10
            z_hi = nz - distance_from_sup_slice
            if z_lo < 0:
                continue
            slab_mask = lung_arr[z_lo:z_hi]
            slab_img = Image(
                jnp.asarray(slab_mask.astype(np.uint8)),
                img.physical_point((0, 0, z_lo)),
                img.spacing,
                img.direction,
            )

            connected = relabel_components(
                connected_components(slab_img, connectivity=26), sort_by_size=False
            )
            conn_arr = np.asarray(connected.array)

            # pick the most elongated region with physical size > 2000 as seed
            max_elong = 0.0
            airway_open = None
            for label in range(1, int(conn_arr.max()) + 1):
                stats = label_shape_statistics(connected, label=label)
                if stats["count"] == 0:
                    continue
                if stats["elongation"] > max_elong and stats["physical_size"] > 2000:
                    cx, cy, cz = stats["centroid_index"]
                    airway_open = (int(cx), int(cy), int(cz) + z_lo)
                    max_elong = stats["elongation"]

            if airway_open is None:
                continue

            # opening must be inside the lung/air mask
            if not lung_arr[airway_open[2], airway_open[1], airway_open[0]]:
                logger.info(
                    "Error locating trachea centroid (extra air features on slice)"
                )
                continue

            logger.info("*Airway opening: %s", airway_open)

            for lung_mask_hu in lung_mask_hu_values:
                logger.info(
                    "Extracting airways. Iteration %d, HU %d, sup offset %d",
                    loop_count, lung_mask_hu, distance_from_sup_slice,
                )
                loop_count += 1

                grown = connected_threshold(
                    img, [airway_open], lower=-2000, upper=lung_mask_hu, connectivity=6
                )
                result = binary_dilate(grown, (2, 2, 2))

                result_arr = np.asarray(result.array) > 0
                airway_mask_physical_size = int(
                    result_arr.sum() * np.prod(img.spacing)
                )

                this_processed_correctly = False
                if airway_mask_physical_size <= 0:
                    continue
                elif airway_mask_physical_size > expected_physical_size_range[1]:
                    logger.info(" Airway mask size failed (too large): %d",
                                airway_mask_physical_size)
                elif airway_mask_physical_size < expected_physical_size_range[0]:
                    logger.info(" Airway mask size failed (too small): %d",
                                airway_mask_physical_size)
                else:
                    logger.info(" Airway mask size passed: %d", airway_mask_physical_size)
                    processed_correctly = True
                    this_processed_correctly = True

                if airway_mask_physical_size > best_result_sim and this_processed_correctly:
                    best_result_sim = airway_mask_physical_size
                    best_result = result
                    best_lung_mask_hu = lung_mask_hu
                    best_distance_from_sup_slice = distance_from_sup_slice

                if processed_correctly and fast_mode:
                    break

    if not processed_correctly or best_result is None:
        logger.error(" Unable to process correctly!!!")
        return None

    logger.info("Selected Lung Mask HU: %d", best_lung_mask_hu)

    # carina detection: scan down until the airway splits into two large trees
    carina_slice = -1
    best_arr = np.asarray(best_result.array) > 0
    voxel_vol = float(np.prod(img.spacing))
    for idx_slice in range(nz - best_distance_from_sup_slice, 0, -1):
        cut = best_arr.copy()
        cut[idx_slice:nz] = False
        if not cut.any():
            break
        lab = relabel_components(connected_components(jnp.asarray(cut), connectivity=26))
        lab_np = np.asarray(lab)
        num_regions = int(lab_np.max())
        if num_regions == 2:
            phys_size_0 = int((lab_np == 1).sum() * voxel_vol)
            phys_size_1 = int((lab_np == 2).sum() * voxel_vol)
            if (
                phys_size_0 > minimum_tree_half_physical_size
                and phys_size_1 > minimum_tree_half_physical_size
            ):
                carina_slice = idx_slice
                break

    if carina_slice >= 0:
        logger.info("Cropping from slice: %d + %d slices", carina_slice, extend_from_carina)
        best_result = fast_mask(best_result, carina_slice + extend_from_carina, nz)

    return best_result.with_array(
        (np.asarray(best_result.array) > 0).astype(np.uint8)
    )
