"""DICOM image series <-> Image conversion.

Replaces the sitk.ImageSeriesReader path used throughout the reference
(platipy/dicom/io/crawl.py, cli/segmentation.py:118-123).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.dicom.io.dataset import Element, generate_uid, read_file, write_file

__all__ = ["read_dicom_series", "dataset_pixel_array", "write_dicom_series",
           "find_dicom_files", "group_dicom_files", "get_suv_bw_scale_factor"]

logger = logging.getLogger(__name__)

_PIXEL = (0x7FE0, 0x0010)


def get_suv_bw_scale_factor(ds) -> float:
    """Body-weight SUV scale factor for a PT dataset (QIBA vendor-neutral
    happy path; reference platipy/dicom/io/crawl.py:44-85).

    Supports BQML units (decay-corrected from radiopharmaceutical start to
    series time) and the Philips private CNTS factor at (7053,1000).
    """
    from datetime import datetime

    units = str(ds.get((0x0054, 0x1001), Element(b"CS", "")).value).strip()
    if units == "CNTS":
        return float(ds[(0x7053, 0x1000)].value)
    if units != "BQML":
        raise ValueError(f"cannot compute SUV for units {units!r}")

    rphs = ds[(0x0054, 0x0016)].value[0]  # RadiopharmaceuticalInformationSequence
    half_life = float(rphs[(0x0018, 0x1075)].value)
    injected_dose = float(rphs[(0x0018, 0x1074)].value)
    start_time = str(rphs[(0x0018, 0x1072)].value).split(".")[0].strip()

    series_date = str(ds[(0x0008, 0x0021)].value).strip()
    series_time = str(ds[(0x0008, 0x0031)].value).split(".")[0].strip()

    fmt = "%Y%m%d_%H%M%S"
    t_series = datetime.strptime(f"{series_date}_{series_time}", fmt)
    t_start = datetime.strptime(f"{series_date}_{start_time}", fmt)
    decay_time_s = (t_series - t_start).total_seconds()
    if decay_time_s < 0:
        # data-entry error or midnight crossing; the reference silently wraps
        # (timedelta.seconds) to a large positive decay — warn instead
        logger.warning(
            "PET series time precedes radiopharmaceutical start time "
            "(decay interval %.0f s); SUV decay correction skipped",
            decay_time_s,
        )
        decay_time_s = 0.0

    decayed_dose = injected_dose * 2.0 ** (-decay_time_s / half_life)
    patient_weight = float(ds[(0x0010, 0x1030)].value)
    return patient_weight * 1000.0 / decayed_dose


def find_dicom_files(directory) -> List[str]:
    """All .dcm/.dc3 (or extensionless DICOM) files below a directory."""
    files = []
    for root, _, names in os.walk(str(directory)):
        for name in names:
            p = os.path.join(root, name)
            low = name.lower()
            if low.endswith(".dcm") or low.endswith(".dc3"):
                files.append(p)
            else:
                try:
                    with open(p, "rb") as f:
                        f.seek(128)
                        if f.read(4) == b"DICM":
                            files.append(p)
                except OSError:
                    pass
    return sorted(files)


def group_dicom_files(files) -> Dict[str, List[str]]:
    """Group file paths by SeriesInstanceUID."""
    groups: Dict[str, List[str]] = {}
    for f in files:
        try:
            ds = read_file(f)
        except Exception:
            continue
        uid = ds.get((0x0020, 0x000E))
        key = uid.value if uid else "unknown"
        groups.setdefault(key, []).append(f)
    return groups


def dataset_pixel_array(ds) -> np.ndarray:
    """Decode (rescaled) pixel data of one dataset -> [rows, cols] float array."""
    rows = int(ds[(0x0028, 0x0010)].value)
    cols = int(ds[(0x0028, 0x0011)].value)
    bits = int(ds.get((0x0028, 0x0100), Element(b"US", 16)).value)
    signed = int(ds.get((0x0028, 0x0103), Element(b"US", 0)).value) == 1
    raw = ds[_PIXEL].value
    if bits == 16:
        dtype = np.int16 if signed else np.uint16
    elif bits == 8:
        dtype = np.int8 if signed else np.uint8
    elif bits == 32:
        dtype = np.int32 if signed else np.uint32
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = int(ds.get((0x0028, 0x0008), Element(b"IS", 1)).value or 1)
    arr = np.frombuffer(raw, dtype=dtype)[: rows * cols * n_frames]
    if n_frames > 1:
        arr = arr.reshape(n_frames, rows, cols)
    else:
        arr = arr.reshape(rows, cols)
    slope = float(ds.get((0x0028, 0x1053), Element(b"DS", 1.0)).value or 1.0)
    intercept = float(ds.get((0x0028, 0x1052), Element(b"DS", 0.0)).value or 0.0)
    return arr.astype(np.float32) * slope + intercept


def read_dicom_series(path_or_files, suv: bool = False) -> Image:
    """Read a DICOM series (directory or file list) into an Image.

    Slices are sorted by position along the slice normal (IOP cross product);
    metadata follows the ITK/LPS convention like the rest of the framework.
    With ``suv=True`` (PT series) each slice is scaled to body-weight SUV
    (reference crawl.py:440-450 behaviour).
    """
    if isinstance(path_or_files, (str, Path)):
        files = find_dicom_files(path_or_files)
        if not files:
            raise FileNotFoundError(f"No DICOM files found under {path_or_files}")
        # group by series (largest wins, like the crawler's default choice)
        # WITHOUT re-parsing: each file is fully decoded exactly once
        parsed = {}
        by_series = {}
        for f in files:
            try:
                ds = read_file(f)
            except Exception:
                continue
            parsed[f] = ds
            uid_el = ds.get((0x0020, 0x000E))
            uid = str(uid_el.value) if uid_el is not None else "unknown"
            by_series.setdefault(uid, []).append(f)
        if not by_series:
            raise FileNotFoundError(f"No DICOM files found under {path_or_files}")
        files = max(by_series.values(), key=len)
        datasets = [parsed[f] for f in files]
    else:
        files = list(path_or_files)
        datasets = [read_file(f) for f in files]

    iop = datasets[0].get((0x0020, 0x0037))
    if iop is not None:
        row_dir = np.asarray(iop.value[:3], dtype=np.float64)
        col_dir = np.asarray(iop.value[3:], dtype=np.float64)
    else:
        row_dir = np.array([1.0, 0, 0])
        col_dir = np.array([0, 1.0, 0])
    normal = np.cross(row_dir, col_dir)

    def position(ds):
        ipp = ds.get((0x0020, 0x0032))
        if ipp is None:
            return 0.0
        return float(np.dot(np.asarray(ipp.value, dtype=np.float64), normal))

    datasets.sort(key=position)

    slices = [dataset_pixel_array(ds) for ds in datasets]
    if suv:
        slices = [s * get_suv_bw_scale_factor(ds)
                  for s, ds in zip(slices, datasets)]
    if len(slices) == 1 and slices[0].ndim == 3:
        # single-file multi-frame series (enhanced CT / NM / PT): the frames
        # ARE the z axis — np.stack would produce a bogus 4-D volume
        volume = slices[0].astype(np.float32)
        multiframe = True
    else:
        volume = np.stack(slices).astype(np.float32)
        multiframe = False

    first = datasets[0]
    ps = first.get((0x0028, 0x0030))
    pixel_spacing = [float(v) for v in np.atleast_1d(ps.value)] if ps else [1.0, 1.0]
    if len(datasets) > 1:
        z_spacing = abs(position(datasets[1]) - position(datasets[0]))
        if z_spacing == 0:
            z_spacing = float(
                first.get((0x0018, 0x0050), Element(b"DS", 1.0)).value or 1.0
            )
    elif multiframe:
        # SpacingBetweenSlices, else SliceThickness
        sbs = first.get((0x0018, 0x0088))
        z_spacing = (abs(float(np.atleast_1d(sbs.value)[0])) if sbs is not None
                     else float(first.get((0x0018, 0x0050), Element(b"DS", 1.0)).value or 1.0))
    else:
        z_spacing = float(first.get((0x0018, 0x0050), Element(b"DS", 1.0)).value or 1.0)

    ipp0 = first.get((0x0020, 0x0032))
    origin = tuple(float(v) for v in ipp0.value) if ipp0 else (0.0, 0.0, 0.0)

    direction = np.stack([row_dir, col_dir, normal], axis=1).reshape(-1)
    spacing = (pixel_spacing[1], pixel_spacing[0], z_spacing)

    return Image(jnp.asarray(volume), origin, spacing, tuple(direction))


def write_dicom_series(image: Image, output_directory, modality: str = "CT",
                       patient_id: str = "PlatiPyTPU", tag_overrides=None) -> List[str]:
    """Write an Image as a DICOM series (one file per axial slice)."""
    output_directory = Path(output_directory)
    output_directory.mkdir(parents=True, exist_ok=True)

    arr = np.asarray(image.array)
    arr_int = np.round(arr).astype(np.int16)
    nz = arr.shape[0]
    d = image.direction_matrix
    row_dir = d[:, 0]
    col_dir = d[:, 1]
    normal = d[:, 2]
    origin = np.asarray(image.origin)
    sx, sy, sz = image.spacing

    study_uid = generate_uid()
    series_uid = generate_uid()
    sop_class = {
        "CT": "1.2.840.10008.5.1.4.1.1.2",
        "MR": "1.2.840.10008.5.1.4.1.1.4",
    }.get(modality, "1.2.840.10008.5.1.4.1.1.2")

    paths = []
    for k in range(nz):
        sop_uid = generate_uid()
        ipp = origin + normal * sz * k
        ds = {
            (0x0008, 0x0016): Element(b"UI", sop_class),
            (0x0008, 0x0018): Element(b"UI", sop_uid),
            (0x0008, 0x0020): Element(b"DA", "20260101"),
            (0x0008, 0x0030): Element(b"TM", "000000"),
            (0x0008, 0x0060): Element(b"CS", modality),
            (0x0010, 0x0010): Element(b"PN", patient_id),
            (0x0010, 0x0020): Element(b"LO", patient_id),
            (0x0018, 0x0050): Element(b"DS", float(sz)),
            (0x0020, 0x000D): Element(b"UI", study_uid),
            (0x0020, 0x000E): Element(b"UI", series_uid),
            (0x0020, 0x0011): Element(b"IS", 1),
            (0x0020, 0x0013): Element(b"IS", k + 1),
            (0x0020, 0x0032): Element(b"DS", [float(v) for v in ipp]),
            (0x0020, 0x0037): Element(
                b"DS", [float(v) for v in row_dir] + [float(v) for v in col_dir]
            ),
            (0x0028, 0x0002): Element(b"US", 1),
            (0x0028, 0x0004): Element(b"CS", "MONOCHROME2"),
            (0x0028, 0x0010): Element(b"US", arr.shape[1]),
            (0x0028, 0x0011): Element(b"US", arr.shape[2]),
            (0x0028, 0x0030): Element(b"DS", [float(sy), float(sx)]),
            (0x0028, 0x0100): Element(b"US", 16),
            (0x0028, 0x0101): Element(b"US", 16),
            (0x0028, 0x0102): Element(b"US", 15),
            (0x0028, 0x0103): Element(b"US", 1),
            (0x0028, 0x1052): Element(b"DS", 0.0),
            (0x0028, 0x1053): Element(b"DS", 1.0),
            _PIXEL: Element(b"OW", arr_int[k].tobytes()),
        }
        if tag_overrides:
            for tag, value in tag_overrides.items():
                if isinstance(tag, str):
                    group, elem = int(tag[:4], 16), int(tag[4:], 16)
                else:
                    group, elem = tag
                existing = ds.get((group, elem))
                vr = existing.vr if existing else b"LO"
                ds[(group, elem)] = Element(vr, value)

        path = str(output_directory / f"{modality}.{k + 1:04d}.dcm")
        write_file(path, ds, sop_class, sop_uid)
        paths.append(path)

    return paths
