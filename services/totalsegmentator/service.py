"""TotalSegmentator service shim (reference: services/totalsegmentator/service.py:36).

Gated on the external `totalsegmentator` package; registers the algorithm so
the service wiring is complete, and raises a clear error when unavailable.
"""

import logging
import os

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image, write_image

logger = logging.getLogger(__name__)

TOTALSEG_SETTINGS_DEFAULTS = {"fast": True, "roi_subset": None}


@app.register("TotalSegmentator", default_settings=TOTALSEG_SETTINGS_DEFAULTS)
def totalsegmentator_service(data_objects, working_dir, settings):
    try:
        from totalsegmentator.python_api import totalsegmentator  # type: ignore
    except ImportError as err:
        raise RuntimeError(
            "TotalSegmentator is not installed in this environment."
        ) from err

    output_objects = []
    for data_object in data_objects:
        out_dir = os.path.join(working_dir, "totalseg")
        totalsegmentator(data_object["path"], out_dir, fast=settings.get("fast", True))
        for f in sorted(os.listdir(out_dir)):
            output_objects.append(
                {"path": os.path.join(out_dir, f), "parent_id": data_object["id"]}
            )
    return output_objects
