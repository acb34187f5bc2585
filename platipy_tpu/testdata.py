"""Public test-data fetchers (reference: platipy/imaging/tests/data.py:23-101).

Zenodo-hosted LCTSC / TCGA-HNSC sample cases the reference's examples and
tests download.  Network access may be unavailable in some deployments; the
fetchers raise a clear error in that case rather than failing mid-extract.
"""

from __future__ import annotations

import logging
from pathlib import Path

from platipy_tpu.utils.download import download_and_extract_zip_file

logger = logging.getLogger(__name__)

LCTSC_TEST_DATA_URL = "https://zenodo.org/record/4747795/files"
LCTSC_DICOM_ZIP = "LCTSC_DICOM.zip"
LCTSC_NIFTI_ZIP = "LCTSC_NIFTI.zip"
TCGA_HNSC_TEST_DATA_URL = "https://zenodo.org/record/5147890/files"
TCGA_HNSC_NIFTI_ZIP = "TCGA_HNSC_NIFTI.zip"

__all__ = ["get_lung_dicom", "get_lung_nifti", "get_hn_nifti"]


def _fetch(url: str, output_directory) -> Path:
    out = Path(output_directory)
    if out.exists() and any(out.iterdir()):
        logger.info("%s already exists, skipping download", out)
        return out
    out.mkdir(parents=True, exist_ok=True)
    download_and_extract_zip_file(url, out)
    return out


def get_lung_dicom(output_directory="./data/dicom"):
    """LCTSC sample DICOM data (reference data.py:31-51)."""
    return _fetch(f"{LCTSC_TEST_DATA_URL}/{LCTSC_DICOM_ZIP}?download=1",
                  output_directory)


def get_lung_nifti(output_directory="./data/nifti/lung"):
    """LCTSC sample NIfTI data (reference data.py:54-75)."""
    return _fetch(f"{LCTSC_TEST_DATA_URL}/{LCTSC_NIFTI_ZIP}?download=1",
                  output_directory)


def get_hn_nifti(output_directory="./data/nifti/hn"):
    """TCGA-HNSC sample NIfTI data (reference data.py:78-101)."""
    return _fetch(f"{TCGA_HNSC_TEST_DATA_URL}/{TCGA_HNSC_NIFTI_ZIP}?download=1",
                  output_directory)
