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


# DICOM keywords resolvable in naming templates and as the parent sorting
# field (reference crawl.py:1025-1035 resolves any header keyword via
# pydicom; this table covers the keywords used for naming/sorting in
# practice — unknown keywords warn and resolve to 0, same as the reference's
# missing-tag behaviour).
_KEYWORD_TAGS = {
    "PatientName": (0x0010, 0x0010),
    "PatientID": (0x0010, 0x0020),
    "PatientBirthDate": (0x0010, 0x0030),
    "PatientSex": (0x0010, 0x0040),
    "Modality": (0x0008, 0x0060),
    "SOPClassUID": (0x0008, 0x0016),
    "SOPInstanceUID": (0x0008, 0x0018),
    "StudyDate": (0x0008, 0x0020),
    "SeriesDate": (0x0008, 0x0021),
    "AcquisitionDate": (0x0008, 0x0022),
    "StudyTime": (0x0008, 0x0030),
    "SeriesTime": (0x0008, 0x0031),
    "AcquisitionTime": (0x0008, 0x0032),
    "AccessionNumber": (0x0008, 0x0050),
    "Manufacturer": (0x0008, 0x0070),
    "InstitutionName": (0x0008, 0x0080),
    "StationName": (0x0008, 0x1010),
    "StudyDescription": (0x0008, 0x1030),
    "SeriesDescription": (0x0008, 0x103E),
    "ManufacturerModelName": (0x0008, 0x1090),
    "BodyPartExamined": (0x0018, 0x0015),
    "SequenceName": (0x0018, 0x0024),
    "SliceThickness": (0x0018, 0x0050),
    "KVP": (0x0018, 0x0060),
    "ProtocolName": (0x0018, 0x1030),
    "PatientPosition": (0x0018, 0x5100),
    "StudyInstanceUID": (0x0020, 0x000D),
    "SeriesInstanceUID": (0x0020, 0x000E),
    "StudyID": (0x0020, 0x0010),
    "SeriesNumber": (0x0020, 0x0011),
    "AcquisitionNumber": (0x0020, 0x0012),
    "InstanceNumber": (0x0020, 0x0013),
    "FrameOfReferenceUID": (0x0020, 0x0052),
    "CorrectedImage": (0x0028, 0x0051),
    "DoseSummationType": (0x3004, 0x000A),
    "DoseType": (0x3004, 0x0004),
    "DoseUnits": (0x3004, 0x0002),
    "StructureSetLabel": (0x3006, 0x0002),
    "StructureSetName": (0x3006, 0x0004),
}

# template fields NOT read from the DICOM header (reference crawl.py:990-996)
_SPECIAL_NAME_FIELDS = [
    "parent_sorting_data", "study_uid_index", "image_desc", "structure_name",
]


def _resolve_keyword(ds, keyword):
    """Value of a DICOM keyword for naming; 0 when absent/unknown (the
    reference preserves the naming convention this way, crawl.py:1027-1035)."""
    tag = _KEYWORD_TAGS.get(keyword)
    el = ds.get(tag) if tag is not None else None
    if el is None:
        logger.warning(
            "  Could not find DICOM header %s. Setting as 0 to preserve "
            "naming convention.", keyword,
        )
        return 0
    return _safe(el.value)


def _template_naming_info(ds, name_format: str) -> Dict[str, object]:
    """Resolve every non-special ``{Field}`` in a name template from the
    DICOM header (reference crawl.py:998-1035)."""
    fields = [
        part[part.find("{") + 1:]
        for part in name_format.split("}")
        if "{" in part
    ]
    # str.format looks fields up by name alone — strip any format spec /
    # conversion ("{SeriesNumber:04d}", "{PatientName!s}") before resolving,
    # or the .format(**info) call KeyErrors on the bare name
    fields = [f.split(":", 1)[0].split("!", 1)[0] for f in fields]
    return {
        f: _resolve_keyword(ds, f)
        for f in fields if f not in _SPECIAL_NAME_FIELDS
    }


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


def _append_output(output_data_dict: Dict, field: str, name: str, value):
    """Insert under ``field`` -> ``name``; colliding names collapse into a
    list (written later with ``_{index}`` suffixes, reference
    crawl.py:1053-1066)."""
    entries = output_data_dict.setdefault(field, {})
    if name not in entries:
        entries[name] = value
    else:
        logger.info("      An entry named %s exists, appending.", name)
        if not isinstance(entries[name], list):
            entries[name] = [entries[name]]
        entries[name].append(value)


def process_dicom_directory(
    dicom_directory,
    parent_sorting_field: str = "PatientName",
    output_image_name_format: str = "{parent_sorting_data}_{study_uid_index}_{Modality}_{image_desc}_{SeriesNumber}",
    output_structure_name_format: str = "{parent_sorting_data}_{study_uid_index}_{Modality}_{structure_name}",
    output_dose_name_format: str = "{parent_sorting_data}_{study_uid_index}_{DoseSummationType}",
    return_extra: bool = True,
    output_directory: str = "./",
    output_file_suffix: str = ".nii.gz",
    overwrite_existing_files: bool = False,
    write_to_disk: bool = True,
    verbose: bool = False,
    initial_sop_class_name_default: str = "UNKNOWN",
):
    """Crawl DICOM directories and convert to NIfTI with templated naming
    (reference crawl.py:836-1147).

    ``dicom_directory`` may be a path or an iterable of paths.  Name
    templates accept the special fields ``parent_sorting_data``,
    ``study_uid_index``, ``image_desc``, ``structure_name`` plus any DICOM
    header keyword (missing keywords resolve to 0 with a warning).  Output
    lands in ``<output_directory>/<parent>/<FIELD>/<name><suffix>`` with
    FIELD one of IMAGES/STRUCTURES/DOSES; colliding names gain ``_{index}``
    suffixes.  With ``write_to_disk=False`` the converted images themselves
    are returned instead of paths.

    Returns {parent: {field: [paths]}} (or {parent: output_data_dict}).
    """
    if isinstance(dicom_directory, (str, Path)):
        dicom_dirs = [dicom_directory]
    else:
        dicom_dirs = list(dicom_directory)
    files = []
    for d in dicom_dirs:
        files.extend(find_dicom_files(d))
    if not files:
        logger.info("No DICOM files found in input directory. Exiting now.")
        return None

    sorting_tag = _KEYWORD_TAGS.get(parent_sorting_field, (0x0010, 0x0010))
    if parent_sorting_field not in _KEYWORD_TAGS:
        logger.warning("Unknown parent sorting field %s; using PatientName",
                       parent_sorting_field)

    # group files into {parent: {(study, series): [files]}}
    groups: Dict[str, Dict[tuple, list]] = {}
    study_uids: Dict[str, Dict[str, int]] = {}
    for f in files:
        if verbose:
            logger.debug("  Reading %s", f)
        try:
            ds = read_file(f)
        except Exception as e:  # unparseable file
            logger.warning("Skipping %s: %s", f, e)
            continue
        parent = _safe(ds.get(sorting_tag, Element(b"LO", "")).value) or "TEMP"
        series = str(ds.get((0x0020, 0x000E), Element(b"UI", "unknown")).value)
        study = str(ds.get((0x0020, 0x000D), Element(b"UI", "unknown")).value)
        per_parent = study_uids.setdefault(parent, {})
        if study not in per_parent:
            per_parent[study] = len(per_parent)
            logger.info("  Setting study instance UID index: %d",
                        per_parent[study])
        groups.setdefault(parent, {}).setdefault((study, series), []).append(f)

    output = {}
    for parent, series_groups in groups.items():
        logger.info("Processing data for %s = %s.", parent_sorting_field, parent)
        logger.info("  Number of DICOM series = %d", len(series_groups))
        output_data_dict: Dict = {"parent_sorting_data": parent}
        images_by_series: Dict[str, object] = {}
        rt_items = []

        # first pass: images (so RTSTRUCTs can rasterise on their own grid)
        for (study, series), series_files in series_groups.items():
            kind, data = process_dicom_series(series_files)
            study_idx = study_uids[parent][study]
            if kind == "image":
                first = read_file(series_files[0])
                image_desc = _safe(get_dicom_info_from_description(
                    first, return_extra=return_extra,
                    sop_class_name=initial_sop_class_name_default,
                ) or "")
                name = output_image_name_format.format(
                    parent_sorting_data=parent, study_uid_index=study_idx,
                    image_desc=image_desc,
                    **_template_naming_info(first, output_image_name_format),
                )
                _append_output(output_data_dict, "IMAGES", name, data)
                images_by_series[series] = data
                images_by_series.setdefault(f"study:{study}", data)
            elif kind in ("rtstruct", "rtdose"):
                rt_items.append((study, series, kind, data, series_files))

        # second pass: RT objects
        for study, series, kind, data, series_files in rt_items:
            study_idx = study_uids[parent][study]
            first = read_file(series_files[0])
            naming_format = (output_structure_name_format if kind == "rtstruct"
                             else output_dose_name_format)
            naming_info = _template_naming_info(first, naming_format)
            if kind == "rtstruct":
                # prefer the series the RTSTRUCT actually references (a
                # study can hold e.g. both PT and CT — rasterising on the
                # wrong grid would silently misalign every mask); fall back
                # to the study's first image series, then any image
                ref_uid = _rtstruct_referenced_series_uid(data)
                ref_image = images_by_series.get(ref_uid) if ref_uid else None
                if ref_image is None:
                    ref_image = images_by_series.get(f"study:{study}")
                if ref_image is None and images_by_series:
                    ref_image = list(images_by_series.values())[0]
                if ref_image is None:
                    logger.warning("RTSTRUCT without a reference image, skipping")
                    continue
                masks, names = transform_point_set_from_dicom_struct(
                    ref_image, data
                )
                for mask, s_name in zip(masks, names):
                    name = output_structure_name_format.format(
                        parent_sorting_data=parent, study_uid_index=study_idx,
                        image_desc="", structure_name=_safe(s_name),
                        **naming_info,
                    )
                    _append_output(output_data_dict, "STRUCTURES", name, mask)
            elif kind == "rtdose":
                dose_img = convert_rtdose(series_files[0])
                name = output_dose_name_format.format(
                    parent_sorting_data=parent, study_uid_index=study_idx,
                    image_desc="", **naming_info,
                )
                _append_output(output_data_dict, "DOSES", name, dose_img)

        if write_to_disk:
            output[str(parent)] = write_output_data_to_disk(
                output_data_dict=output_data_dict,
                output_directory=output_directory,
                output_file_suffix=output_file_suffix,
                overwrite_existing_files=overwrite_existing_files,
            )
        else:
            output[str(parent)] = output_data_dict

    return output
