"""RTSTRUCT -> NIfTI conversion
(reference: platipy/dicom/io/rtstruct_to_nifti.py:44-260).

Contour polygons (physical mm point triplets) are rasterised slice-wise with
an even-odd polygon fill in index space.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.dicom.io.dataset import read_file
from platipy_tpu.dicom.io.series import read_dicom_series

__all__ = ["read_dicom_image", "read_dicom_struct_file", "fix_missing_data",
           "transform_point_set_from_dicom_struct", "convert_rtstruct"]


def read_dicom_image(dicom_path):
    """Read a DICOM image (series directory or file list) into an ``Image``
    (reference rtstruct_to_nifti.py:28-41)."""
    return read_dicom_series(dicom_path)


def read_dicom_struct_file(filename):
    """Read an RTSTRUCT dataset."""
    return read_file(str(filename))


def fix_missing_data(contour_data):
    """Repair a single missing ('') coordinate in a contour triplet stream by
    linear interpolation of its axis neighbours; a missing z takes the minimum
    slice value (reference rtstruct_to_nifti.py:54-102 / crawl.py:202-252)."""
    data = np.array(contour_data, dtype=object)
    missing = np.where(data == "")[0]
    if missing.shape[0] == 0:
        return np.asarray(data, dtype=np.float64)
    if missing.shape[0] > 1:
        raise ValueError("more than one missing contour value cannot be repaired")
    index = int(missing[0])
    axis = index % 3
    n = len(data)
    if axis in (0, 1):
        # interpolate between the same coordinate of the neighbouring points,
        # wrapping around the closed contour at either end
        lower = data[(index - 3) % n]
        upper = data[(index + 3) % n]
        data[index] = 0.5 * (float(lower) + float(upper))
    else:
        slice_vals = [float(v) for v in data[2::3] if v != ""]
        data[index] = min(slice_vals)
    return np.asarray(data, dtype=np.float64)


def _polygon_mask_2d(points_yx: np.ndarray, shape) -> np.ndarray:
    """Even-odd fill of a closed polygon given (row, col) float vertices."""
    from matplotlib.path import Path as MplPath

    yy, xx = np.mgrid[: shape[0], : shape[1]]
    test = np.stack([yy.ravel(), xx.ravel()], axis=1)
    path = MplPath(points_yx)
    inside = path.contains_points(test)
    return inside.reshape(shape)


def transform_point_set_from_dicom_struct(image: Image, struct_ds, spacing_override=None):
    """Rasterise every ROI of an RTSTRUCT into binary masks on ``image``'s grid.

    Returns (list of Image masks, list of ROI names).
    """
    rois = struct_ds.get((0x3006, 0x0020))
    contours = struct_ds.get((0x3006, 0x0039))
    if rois is None or contours is None:
        return [], []

    roi_names = {}
    for item in rois.value:
        number = item.get((0x3006, 0x0022))
        name = item.get((0x3006, 0x0026))
        if number is not None:
            roi_names[int(number.value)] = str(name.value) if name else f"ROI_{number.value}"

    p2i = image.physical_to_index_matrix()
    shape = image.spatial_shape

    masks, names = [], []
    for roi_item in contours.value:
        number = roi_item.get((0x3006, 0x0084))
        roi_number = int(number.value) if number is not None else -1
        name = roi_names.get(roi_number, f"ROI_{roi_number}")

        mask = np.zeros(shape, dtype=np.uint8)
        contour_seq = roi_item.get((0x3006, 0x0040))
        if contour_seq is not None:
            for contour in contour_seq.value:
                data = contour.get((0x3006, 0x0050))
                if data is None:
                    continue
                values = data.value
                if any(v == "" for v in np.atleast_1d(np.asarray(values, dtype=object))):
                    # repair a missing coordinate by interpolation
                    # (reference rtstruct_to_nifti.py:54-102)
                    values = fix_missing_data(list(np.atleast_1d(
                        np.asarray(values, dtype=object))))
                pts = np.asarray(values, dtype=np.float64).reshape(-1, 3)
                idx = pts @ p2i[:3, :3].T + p2i[:3, 3]
                z = int(round(float(np.median(idx[:, 2]))))
                if z < 0 or z >= shape[0]:
                    continue
                poly_yx = idx[:, [1, 0]]
                filled = _polygon_mask_2d(poly_yx, shape[1:])
                mask[z] ^= filled.astype(np.uint8)  # even-odd across contours

        masks.append(image.with_array(jnp.asarray(mask)))
        names.append(name)

    return masks, names


def convert_rtstruct(
    dcm_img,
    dcm_rt_file,
    prefix: str = "Struct_",
    output_dir: str = ".",
    output_img=None,
    spacing=None,
):
    """Convert an RTSTRUCT (+ its image series) to NIfTI masks
    (reference rtstruct_to_nifti.py:220-260)."""
    from platipy_tpu.nifti.io import write_image

    image = read_dicom_series(dcm_img)
    struct_ds = read_dicom_struct_file(dcm_rt_file)

    if spacing:
        if isinstance(spacing, str):
            spacing = [float(s) for s in spacing.split(",")]
        from platipy_tpu.core.resample import resample

        size = np.asarray(image.size, dtype=np.float64)
        new_size = np.round(size * np.asarray(image.spacing) / np.asarray(spacing)).astype(int)
        ref = Image(
            jnp.zeros((int(new_size[2]), int(new_size[1]), int(new_size[0])), jnp.float32),
            image.origin, tuple(spacing), image.direction,
        )
        image = resample(image, ref, None, interp="linear")

    masks, names = transform_point_set_from_dicom_struct(image, struct_ds)

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    for mask, name in zip(masks, names):
        clean = "".join(c if (c.isalnum() or c in "_-") else "_" for c in name)
        write_image(mask, str(output_dir / f"{prefix}{clean}.nii.gz"))

    if output_img is not None:
        if not str(output_img).endswith(".nii.gz"):
            output_img = f"{output_img}.nii.gz"
        write_image(image, str(output_dir / output_img))

    return masks, names
