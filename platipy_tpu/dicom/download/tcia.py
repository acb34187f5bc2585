"""TCIA (The Cancer Imaging Archive) REST download
(reference: platipy/dicom/download/tcia.py:39-226)."""

from __future__ import annotations

import io
import logging
import tempfile
import zipfile
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["get_collections", "get_patients_in_collection", "get_modalities_in_collection",
           "fetch_data", "get_lung_data", "get_hn_data"]

API_URL = "https://services.cancerimagingarchive.net/services/v4/TCIA/query"


def _get_json(endpoint, params):
    import requests

    res = requests.get(f"{API_URL}/{endpoint}", params=params, timeout=60)
    res.raise_for_status()
    return res.json()


def get_collections():
    return [c["Collection"] for c in _get_json("getCollectionValues", {})]


def get_patients_in_collection(collection):
    return sorted(
        p["PatientID"] for p in _get_json("getPatient", {"Collection": collection})
    )


def get_modalities_in_collection(collection):
    return {
        m["Modality"]
        for m in _get_json("getModalityValues", {"Collection": collection})
        if "Modality" in m
    }


def fetch_data(collection, patient_ids=None, number_of_patients=1, modalities=None,
               nifti=True, output_directory=None):
    """Fetch series for patients in a TCIA collection; optionally convert to
    NIfTI via the crawler.  Returns {patient_id: output_path}."""
    import requests

    if output_directory is None:
        output_directory = Path(tempfile.gettempdir()) / "platipy_tpu" / "tcia" / collection
    output_directory = Path(output_directory)
    output_directory.mkdir(parents=True, exist_ok=True)

    if patient_ids is None:
        patient_ids = get_patients_in_collection(collection)[:number_of_patients]

    result = {}
    for patient_id in patient_ids:
        patient_dir = output_directory / patient_id
        if patient_dir.exists() and len(list(patient_dir.glob("**/*"))) > 0:
            logger.info("%s already fetched", patient_id)
            result[patient_id] = str(patient_dir)
            continue

        series = _get_json(
            "getSeries", {"Collection": collection, "PatientID": patient_id}
        )
        dicom_dir = patient_dir / "dicom"
        dicom_dir.mkdir(parents=True, exist_ok=True)
        for s in series:
            if modalities and s.get("Modality") not in modalities:
                continue
            uid = s["SeriesInstanceUID"]
            res = requests.get(
                f"{API_URL}/getImage", params={"SeriesInstanceUID": uid}, timeout=600
            )
            res.raise_for_status()
            with zipfile.ZipFile(io.BytesIO(res.content)) as zf:
                zf.extractall(str(dicom_dir / uid))

        if nifti:
            from platipy_tpu.dicom.io.crawl import process_dicom_directory

            process_dicom_directory(
                str(dicom_dir), output_directory=str(patient_dir / "nifti")
            )
        result[patient_id] = str(patient_dir)

    return result


def get_lung_data(number_of_patients=1, output_directory=None):
    return fetch_data(
        "LCTSC", number_of_patients=number_of_patients,
        modalities=["CT", "RTSTRUCT"], output_directory=output_directory,
    )


def get_hn_data(number_of_patients=1, output_directory=None):
    return fetch_data(
        "HNSCC", number_of_patients=number_of_patients,
        modalities=["CT", "RTSTRUCT"], output_directory=output_directory,
    )
