"""Bronchus segmentation service (reference: services/bronchus/service.py:34)."""

import logging
import os

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image, write_image
from platipy_tpu.projects.bronchus.run import (
    BRONCHUS_SETTINGS_DEFAULTS,
    run_bronchus_segmentation,
)

logger = logging.getLogger(__name__)


@app.register("Bronchus Segmentation", default_settings=BRONCHUS_SETTINGS_DEFAULTS)
def bronchus_service(data_objects, working_dir, settings):
    output_objects = []
    for data_object in data_objects:
        img = read_image(data_object["path"])
        results = run_bronchus_segmentation(img, settings)
        for name, mask in results.items():
            out_path = os.path.join(working_dir, f"{name}.nii.gz")
            write_image(mask, out_path)
            output_objects.append({"path": out_path, "parent_id": data_object["id"]})
    return output_objects
