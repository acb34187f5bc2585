"""NIfTI masks -> RTSTRUCT conversion
(reference: platipy/dicom/io/nifti_to_rtstruct.py:44, built on rt-utils).

Per-slice closed contours are extracted with Moore boundary tracing and
written as ContourData point triplets referencing the image series.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

from platipy_tpu.dicom.io.dataset import Element, generate_uid, read_file, write_file
from platipy_tpu.dicom.io.series import find_dicom_files, group_dicom_files

__all__ = ["trace_contours_2d", "convert_nifti"]

_MOORE_OFFSETS = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def trace_contours_2d(mask2d: np.ndarray) -> List[np.ndarray]:
    """Closed outer boundaries of each connected region (Moore tracing).

    Returns a list of [N, 2] arrays of (row, col) vertices.
    """
    from scipy import ndimage

    contours = []
    labelled, n = ndimage.label(mask2d)
    for region in range(1, n + 1):
        m = labelled == region
        rows, cols = np.nonzero(m)
        if rows.size == 0:
            continue
        # start: top-most, left-most pixel
        start = (rows.min(), cols[rows == rows.min()].min())

        padded = np.pad(m, 1)
        sr, sc = start[0] + 1, start[1] + 1
        boundary = [(sr, sc)]
        # initial backtrack: the pixel to the left
        b = (sr, sc - 1)
        current = (sr, sc)
        for _ in range(8 * m.sum() + 8):
            # find index of backtrack in neighbourhood of current
            diff = (b[0] - current[0], b[1] - current[1])
            try:
                start_idx = _MOORE_OFFSETS.index(diff)
            except ValueError:
                start_idx = 0
            found = None
            for k in range(1, 9):
                off = _MOORE_OFFSETS[(start_idx + k) % 8]
                cand = (current[0] + off[0], current[1] + off[1])
                if padded[cand]:
                    prev_off = _MOORE_OFFSETS[(start_idx + k - 1) % 8]
                    b = (current[0] + prev_off[0], current[1] + prev_off[1])
                    found = cand
                    break
            if found is None:
                break  # isolated pixel
            current = found
            if current == boundary[0] and len(boundary) > 1:
                break
            boundary.append(current)
        contours.append(np.asarray(boundary, dtype=np.float64) - 1.0)
    return contours


def convert_nifti(dcm_path, mask_input, output_file):
    """Convert NIfTI mask(s) to an RTSTRUCT referencing a DICOM series
    (reference nifti_to_rtstruct.py:44).

    ``mask_input``: dict of name -> (path or Image), or a list of paths where
    the name is derived from the filename.
    """
    from platipy_tpu.nifti.io import read_image

    files = find_dicom_files(dcm_path)
    groups = group_dicom_files(files)
    series_files = max(groups.values(), key=len)
    datasets = [read_file(f) for f in series_files]

    first = datasets[0]
    study_uid = first[(0x0020, 0x000D)].value
    frame_uid_el = first.get((0x0020, 0x0052))
    frame_uid = frame_uid_el.value if frame_uid_el else generate_uid()
    series_uid_img = first[(0x0020, 0x000E)].value
    img_sop_class = first[(0x0008, 0x0016)].value

    # sort datasets by z
    iop = first.get((0x0020, 0x0037))
    row_dir = np.asarray(iop.value[:3]) if iop else np.array([1.0, 0, 0])
    col_dir = np.asarray(iop.value[3:]) if iop else np.array([0, 1.0, 0])
    normal = np.cross(row_dir, col_dir)
    datasets.sort(key=lambda d: float(np.dot(np.asarray(d[(0x0020, 0x0032)].value), normal)))
    sop_uids = [d[(0x0008, 0x0018)].value for d in datasets]
    ipps = [np.asarray(d[(0x0020, 0x0032)].value, dtype=np.float64) for d in datasets]

    if isinstance(mask_input, dict):
        masks = {
            name: (read_image(m) if isinstance(m, (str, Path)) else m)
            for name, m in mask_input.items()
        }
    else:
        masks = {}
        for m in mask_input:
            name = Path(m).name.replace(".nii.gz", "").replace(".nii", "")
            masks[name] = read_image(m)

    roi_contour_items = []
    structure_set_items = []
    colors = [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [0, 255, 255],
              [255, 0, 255], [255, 128, 0], [128, 0, 255]]

    for roi_number, (name, mask) in enumerate(masks.items(), start=1):
        i2p = mask.index_to_physical_matrix()
        arr = np.asarray(mask.array) > 0

        contour_items = []
        for z in range(arr.shape[0]):
            if not arr[z].any():
                continue
            # reference the closest image slice
            slice_phys = mask.physical_point((0, 0, z))
            dists = [abs(np.dot(slice_phys - ipp, normal)) for ipp in ipps]
            ref_idx = int(np.argmin(dists))
            for poly in trace_contours_2d(arr[z]):
                if poly.shape[0] < 3:
                    continue
                idx_pts = np.stack(
                    [poly[:, 1], poly[:, 0], np.full(poly.shape[0], z)], axis=1
                )
                phys = idx_pts @ i2p[:3, :3].T + i2p[:3, 3]
                contour_items.append({
                    (0x3006, 0x0016): Element(b"SQ", [{
                        (0x0008, 0x1150): Element(b"UI", img_sop_class),
                        (0x0008, 0x1155): Element(b"UI", sop_uids[ref_idx]),
                    }]),
                    (0x3006, 0x0042): Element(b"CS", "CLOSED_PLANAR"),
                    (0x3006, 0x0046): Element(b"IS", poly.shape[0]),
                    (0x3006, 0x0050): Element(
                        b"DS", [float(v) for v in phys.reshape(-1)]
                    ),
                })

        roi_contour_items.append({
            (0x3006, 0x002A): Element(b"IS", colors[(roi_number - 1) % len(colors)]),
            (0x3006, 0x0040): Element(b"SQ", contour_items),
            (0x3006, 0x0084): Element(b"IS", roi_number),
        })
        structure_set_items.append({
            (0x3006, 0x0022): Element(b"IS", roi_number),
            (0x3006, 0x0024): Element(b"UI", frame_uid),
            (0x3006, 0x0026): Element(b"LO", name),
            (0x3006, 0x0036): Element(b"CS", "MANUAL"),
        })

    rt_sop_class = "1.2.840.10008.5.1.4.1.1.481.3"
    rt_sop_uid = generate_uid()
    ds = {
        (0x0008, 0x0016): Element(b"UI", rt_sop_class),
        (0x0008, 0x0018): Element(b"UI", rt_sop_uid),
        (0x0008, 0x0020): Element(b"DA", "20260101"),
        (0x0008, 0x0030): Element(b"TM", "000000"),
        (0x0008, 0x0060): Element(b"CS", "RTSTRUCT"),
        (0x0010, 0x0010): first.get((0x0010, 0x0010), Element(b"PN", "Unknown")),
        (0x0010, 0x0020): first.get((0x0010, 0x0020), Element(b"LO", "Unknown")),
        (0x0020, 0x000D): Element(b"UI", study_uid),
        (0x0020, 0x000E): Element(b"UI", generate_uid()),
        (0x0020, 0x0011): Element(b"IS", 1),
        (0x3006, 0x0002): Element(b"SH", "platipy_tpu"),
        (0x3006, 0x0008): Element(b"DA", "20260101"),
        (0x3006, 0x0009): Element(b"TM", "000000"),
        (0x3006, 0x0010): Element(b"SQ", [{
            (0x0020, 0x0052): Element(b"UI", frame_uid),
            (0x3006, 0x0012): Element(b"SQ", [{
                (0x0008, 0x1150): Element(
                    b"UI", "1.2.840.10008.3.1.2.3.1"
                ),
                (0x0008, 0x1155): Element(b"UI", study_uid),
                (0x3006, 0x0014): Element(b"SQ", [{
                    (0x0020, 0x000E): Element(b"UI", series_uid_img),
                    (0x3006, 0x0016): Element(b"SQ", [
                        {
                            (0x0008, 0x1150): Element(b"UI", img_sop_class),
                            (0x0008, 0x1155): Element(b"UI", uid),
                        }
                        for uid in sop_uids
                    ]),
                }]),
            }]),
        }]),
        (0x3006, 0x0020): Element(b"SQ", structure_set_items),
        (0x3006, 0x0039): Element(b"SQ", roi_contour_items),
        (0x3006, 0x0080): Element(b"SQ", [
            {
                (0x3006, 0x0082): Element(b"IS", i + 1),
                (0x3006, 0x0084): Element(b"IS", i + 1),
                (0x3006, 0x0085): Element(b"SH", name[:16]),
                (0x3006, 0x00A4): Element(b"CS", "ORGAN"),
                (0x3006, 0x00A6): Element(b"PN", "platipy_tpu"),
            }
            for i, name in enumerate(masks.keys())
        ]),
    }

    write_file(str(output_file), ds, rt_sop_class, rt_sop_uid)
    return output_file
