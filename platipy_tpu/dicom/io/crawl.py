"""DICOM directory crawler (reference: platipy/dicom/io/crawl.py:836-1147).

Recursively finds DICOM files, groups them by patient + series, converts image
series / RTSTRUCT / RTDOSE objects to NIfTI with templated output naming.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Dict

import numpy as np

from platipy_tpu.dicom.io.dataset import Element, read_file
from platipy_tpu.dicom.io.rtdose_to_nifti import convert_rtdose
from platipy_tpu.dicom.io.rtstruct_to_nifti import (
    fix_missing_data,
    transform_point_set_from_dicom_struct,
)
from platipy_tpu.dicom.io.series import (
    find_dicom_files,
    get_suv_bw_scale_factor,
    read_dicom_series,
)

logger = logging.getLogger(__name__)

__all__ = [
    "flatten",
    "get_dicom_info_from_description",
    "safe_sort_dicom_image_list",
    "fix_missing_data",
    "process_dicom_file_list",
    "process_dicom_directory",
    "process_dicom_series",
    "write_output_data_to_disk",
]


def _safe(text) -> str:
    return "".join(c if (c.isalnum() or c in "_-") else "_" for c in str(text))


def flatten(itr):
    """Depth-first flattening of nested lists/tuples (reference crawl.py:33-41)."""
    if isinstance(itr, (str, bytes)):
        yield itr
        return
    try:
        for item in itr:
            yield from flatten(item)
    except TypeError:
        yield itr


def _tag_str(ds, tag, default=""):
    el = ds.get(tag)
    return str(el.value) if el is not None else default


def get_dicom_info_from_description(dicom_object, return_extra=False,
                                    sop_class_name="UNKNOWN"):
    """Extract a naming hint from a DICOM header (reference crawl.py:87-168).

    CT: '' (or PROTOCOL_NAME if ``return_extra``); MR: protocol / combined
    protocol+sequence+series-description; PT: 'AC'/'NAC' by whether
    attenuation correction appears in CorrectedImage.
    """
    modality = _tag_str(dicom_object, (0x0008, 0x0060))

    def norm(text):
        return re.sub(r"[^\w]", "_", text).upper()

    if modality == "CT":
        if return_extra:
            protocol = _tag_str(dicom_object, (0x0018, 0x1030))
            if protocol:
                return norm(protocol)
        return ""
    if modality == "MR":
        protocol = norm(_tag_str(dicom_object, (0x0018, 0x1030)))
        sequence = norm(_tag_str(dicom_object, (0x0018, 0x0024)))
        description = norm(_tag_str(dicom_object, (0x0008, 0x103E)))
        combined = "_".join([protocol, sequence, description])
        while "__" in combined:
            combined = combined.replace("__", "_")
        if protocol and not return_extra:
            return protocol
        return combined
    if modality == "PT":
        corrections = _tag_str(dicom_object, (0x0028, 0x0051), "NONE")
        return "AC" if "ATTN" in corrections else "NAC"
    return ""


def safe_sort_dicom_image_list(dicom_image_list):
    """Sort image files by position projected on the slice normal
    (reference crawl.py:171-199) — robust to HFS/FFS unlike SliceLocation."""
    locations = {}
    for dicom_file in dicom_image_list:
        ds = read_file(str(dicom_file))
        position = np.array(
            [float(v) for v in ds[(0x0020, 0x0032)].value], dtype=float
        )
        orientation = np.array(
            [float(v) for v in ds[(0x0020, 0x0037)].value], dtype=float
        )
        normal = np.cross(orientation[:3], orientation[3:])
        locations[dicom_file] = (position * normal)[2]
    return sorted(dicom_image_list, key=lambda f: locations[f])


def _rtstruct_referenced_series_uid(struct_ds):
    """SeriesInstanceUID of the image series an RTSTRUCT's contours reference
    (ReferencedFrameOfReference -> RTReferencedStudy -> RTReferencedSeries),
    or None when the chain is absent."""
    frame_seq = struct_ds.get((0x3006, 0x0010))
    if frame_seq is None:
        return None
    for frame_item in frame_seq.value:
        study_seq = frame_item.get((0x3006, 0x0012))
        if study_seq is None:
            continue
        for study_item in study_seq.value:
            series_seq = study_item.get((0x3006, 0x0014))
            if series_seq is None:
                continue
            for series_item in series_seq.value:
                uid = series_item.get((0x0020, 0x000E))
                if uid is not None:
                    return str(uid.value)
    return None


def process_dicom_file_list(dicom_file_list, parent_sorting_field="PatientName",
                            verbose=False):
    """Group DICOM files as {parent: {series_uid: [files]}}
    (reference crawl.py:359-393)."""
    sorting_tag = {
        "PatientName": (0x0010, 0x0010),
        "PatientID": (0x0010, 0x0020),
    }.get(parent_sorting_field, (0x0010, 0x0010))

    series_dict: Dict[str, Dict[str, list]] = {}
    for i, dicom_file in enumerate(sorted(str(f) for f in dicom_file_list)):
        if verbose:
            logger.debug("  Sorting file %d", i)
        if "dicomdir" in dicom_file.lower():
            logger.warning("DICOMDIR is not supported; images are read directly.")
            continue
        ds = read_file(dicom_file)
        parent = _tag_str(ds, sorting_tag, "unknown")
        series_uid = _tag_str(ds, (0x0020, 0x000E), "unknown")
        series_dict.setdefault(parent, {}).setdefault(series_uid, []).append(
            dicom_file
        )
    return series_dict


def write_output_data_to_disk(
    output_data_dict,
    output_directory="./",
    output_file_suffix=".nii.gz",
    overwrite_existing_files=False,
):
    """Write a nested {field: {name: Image-or-list}} dict under
    <output_directory>/<parent>/<field>/ (reference crawl.py:719-833)."""
    if output_data_dict is None:
        return None
    from platipy_tpu.nifti.io import write_image

    parent = output_data_dict.get("parent_sorting_data", "unknown")
    files_written: Dict[str, list] = {}
    for field, items in output_data_dict.items():
        if field == "parent_sorting_data":
            continue
        field_dir = Path(output_directory) / str(parent) / field
        field_dir.mkdir(parents=True, exist_ok=True)
        files_written[field] = []
        for base_name, value in items.items():
            images = list(flatten([value]))
            multiple = len(images) > 1
            for index, image in enumerate(images):
                name = f"{base_name}_{index}" if multiple else base_name
                while "__" in name:
                    name = name.replace("__", "_")
                name = name.rstrip("_")
                out_path = field_dir / f"{name}{output_file_suffix}"
                if out_path.exists() and not overwrite_existing_files:
                    logger.warning("%s exists, skipping (overwrite off)", out_path)
                    continue
                write_image(image, str(out_path))
                files_written[field].append(str(out_path))
    return files_written


def process_dicom_series(series_files, parent_sorting_field="PatientName"):
    """Classify one series: returns (kind, data) where kind in
    {image, rtstruct, rtdose, unknown}."""
    first = read_file(series_files[0])
    modality = str(first.get((0x0008, 0x0060), Element(b"CS", "")).value)
    if modality == "PT":
        # PT converts to body-weight SUV when possible (reference
        # crawl.py:440-450); fall back to raw activity otherwise
        try:
            return "image", read_dicom_series(series_files, suv=True)
        except (KeyError, ValueError) as e:
            logger.warning("SUV scaling unavailable (%s); converting raw PT", e)
            return "image", read_dicom_series(series_files)
    if modality in ("CT", "MR"):
        return "image", read_dicom_series(series_files)
    if modality == "RTSTRUCT":
        return "rtstruct", first
    if modality == "RTDOSE":
        return "rtdose", series_files[0]
    return "unknown", None


def process_dicom_directory(
    input_directory,
    parent_sorting_field: str = "PatientName",
    output_image_name_format: str = "{parent_sorting_data}_{study_uid_index}_{Modality}_{image_desc}_{series_num}",
    output_structure_name_format: str = "{parent_sorting_data}_{study_uid_index}_{Modality}_{structure_name}",
    output_dose_name_format: str = "{parent_sorting_data}_{study_uid_index}_{DoseSummationType}",
    return_extra: bool = True,
    output_directory: str = ".",
):
    """Crawl a directory of DICOM files and write NIfTI conversions.

    Returns a dict of output file paths per patient.
    """
    from platipy_tpu.nifti.io import write_image

    output_directory = Path(output_directory)
    output_directory.mkdir(parents=True, exist_ok=True)

    sorting_tag = {
        "PatientName": (0x0010, 0x0010),
        "PatientID": (0x0010, 0x0020),
    }.get(parent_sorting_field, (0x0010, 0x0010))

    files = find_dicom_files(input_directory)
    if not files:
        logger.warning("No DICOM files found in %s", input_directory)
        return {}

    # group by (parent, series uid)
    groups: Dict[tuple, list] = {}
    study_uids: Dict[str, Dict[str, int]] = {}
    for f in files:
        try:
            ds = read_file(f)
        except Exception as e:  # unparseable file
            logger.warning("Skipping %s: %s", f, e)
            continue
        parent = _safe(ds.get(sorting_tag, Element(b"LO", "unknown")).value)
        series = str(ds.get((0x0020, 0x000E), Element(b"UI", "unknown")).value)
        study = str(ds.get((0x0020, 0x000D), Element(b"UI", "unknown")).value)
        study_uids.setdefault(parent, {})
        if study not in study_uids[parent]:
            study_uids[parent][study] = len(study_uids[parent])
        groups.setdefault((parent, study, series), []).append(f)

    output: Dict[str, Dict[str, str]] = {}
    images_by_frame: Dict[str, object] = {}

    # first pass: images (so RTSTRUCTs can reference their grids)
    rt_items = []
    for (parent, study, series), series_files in groups.items():
        kind, data = process_dicom_series(series_files)
        study_idx = study_uids[parent][study]
        out = output.setdefault(parent, {})
        if kind == "image":
            first = read_file(series_files[0])
            modality = str(first.get((0x0008, 0x0060), Element(b"CS", "")).value)
            desc = _safe(first.get((0x0008, 0x103E), Element(b"LO", "")).value)
            series_num = first.get((0x0020, 0x0011), Element(b"IS", 0)).value
            name = output_image_name_format.format(
                parent_sorting_data=parent, study_uid_index=study_idx,
                Modality=modality, image_desc=desc, series_num=series_num,
            )
            path = output_directory / f"{name}.nii.gz"
            write_image(data, str(path))
            out[name] = str(path)
            images_by_frame[series] = data
            images_by_frame.setdefault(f"study:{study}", data)
        elif kind in ("rtstruct", "rtdose"):
            rt_items.append((parent, study, series, kind, data, series_files))

    # second pass: RT objects
    for parent, study, series, kind, data, series_files in rt_items:
        study_idx = study_uids[parent][study]
        out = output.setdefault(parent, {})
        if kind == "rtstruct":
            # prefer the series the RTSTRUCT actually references (a study can
            # hold e.g. both PT and CT — rasterising on the wrong grid would
            # silently misalign every mask); fall back to the study's first
            # image series, then any image
            ref_uid = _rtstruct_referenced_series_uid(data)
            ref_image = images_by_frame.get(ref_uid) if ref_uid else None
            if ref_image is None:
                ref_image = images_by_frame.get(f"study:{study}")
            if ref_image is None and images_by_frame:
                ref_image = list(images_by_frame.values())[0]
            if ref_image is None:
                logger.warning("RTSTRUCT without a reference image, skipping")
                continue
            masks, names = transform_point_set_from_dicom_struct(ref_image, data)
            for mask, s_name in zip(masks, names):
                name = output_structure_name_format.format(
                    parent_sorting_data=parent, study_uid_index=study_idx,
                    Modality="RTSTRUCT", structure_name=_safe(s_name),
                )
                path = output_directory / f"{name}.nii.gz"
                write_image(mask, str(path))
                out[name] = str(path)
        elif kind == "rtdose":
            ds = read_file(series_files[0])
            summation = _safe(
                ds.get((0x3004, 0x000A), Element(b"CS", "PLAN")).value
            )
            dose_img = convert_rtdose(series_files[0])
            name = output_dose_name_format.format(
                parent_sorting_data=parent, study_uid_index=study_idx,
                DoseSummationType=summation,
            )
            path = output_directory / f"{name}.nii.gz"
            write_image(dose_img, str(path))
            out[name] = str(path)

    return output
