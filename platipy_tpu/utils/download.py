"""Download helpers (reference: platipy/utils.py download_and_extract_zip_file)."""

from __future__ import annotations

import logging
import os
import zipfile
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["download_and_extract_zip_file"]


def download_and_extract_zip_file(zip_url: str, output_directory):
    """Download a zip from a URL and extract it into output_directory."""
    import tempfile
    import urllib.request

    output_directory = Path(output_directory)
    output_directory.mkdir(parents=True, exist_ok=True)

    with tempfile.NamedTemporaryFile(suffix=".zip", delete=False) as tmp:
        tmp_path = tmp.name
    logger.info("Downloading %s", zip_url)
    urllib.request.urlretrieve(zip_url, tmp_path)

    with zipfile.ZipFile(tmp_path, "r") as zip_ref:
        zip_ref.extractall(output_directory)
    os.unlink(tmp_path)
