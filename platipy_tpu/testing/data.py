"""Test-data fetchers (reference: platipy/imaging/tests/data.py:24-99).

Downloads the LCTSC / TCGA-HNSC sample datasets from Zenodo, cached by
directory existence.  Requires network access.
"""

from __future__ import annotations

import logging
import tempfile
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["get_lung_nifti", "get_hn_nifti", "get_lung_dicom"]

LUNG_NIFTI_URL = "https://zenodo.org/record/5276878/files/LCTSC_NIFTI.zip?download=1"
LUNG_DICOM_URL = "https://zenodo.org/record/5276878/files/LCTSC_DICOM.zip?download=1"
HN_NIFTI_URL = "https://zenodo.org/record/5276878/files/TCGA_HNSC_NIFTI.zip?download=1"


def _fetch(url: str, name: str, output_directory=None) -> Path:
    from platipy_tpu.utils.download import download_and_extract_zip_file

    if output_directory is None:
        output_directory = Path(tempfile.gettempdir()) / "platipy_tpu" / name
    output_directory = Path(output_directory)
    if output_directory.exists() and any(output_directory.iterdir()):
        logger.info("%s already fetched", name)
        return output_directory
    download_and_extract_zip_file(url, output_directory)
    return output_directory


def get_lung_nifti(output_directory=None) -> Path:
    return _fetch(LUNG_NIFTI_URL, "lung_nifti", output_directory)


def get_lung_dicom(output_directory=None) -> Path:
    return _fetch(LUNG_DICOM_URL, "lung_dicom", output_directory)


def get_hn_nifti(output_directory=None) -> Path:
    return _fetch(HN_NIFTI_URL, "hn_nifti", output_directory)
