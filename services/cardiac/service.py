"""Cardiac segmentation service (reference: services/cardiac/service.py:34-148)."""

import logging
import os

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image, write_image
from platipy_tpu.projects.cardiac.run import (
    CARDIAC_SETTINGS_DEFAULTS,
    HYBRID_SETTINGS_DEFAULTS,
    run_cardiac_segmentation,
    run_hybrid_segmentation,
)

logger = logging.getLogger(__name__)


@app.register("Cardiac Segmentation", default_settings=HYBRID_SETTINGS_DEFAULTS)
def cardiac_service(data_objects, working_dir, settings):
    """Run the hybrid cardiac segmentation on each input data object."""
    output_objects = []
    for data_object in data_objects:
        img = read_image(data_object["path"])
        results, _ = run_hybrid_segmentation(img, settings)
        for name, mask in results.items():
            out_path = os.path.join(working_dir, f"{name}.nii.gz")
            write_image(mask, out_path)
            output_objects.append({"path": out_path, "parent_id": data_object["id"]})
    return output_objects


@app.register("Cardiac Structure Guided Segmentation",
              default_settings=CARDIAC_SETTINGS_DEFAULTS)
def cardiac_structure_guided_service(data_objects, working_dir, settings):
    """Run the structure-guided cardiac segmentation: expects image + guide
    structure pairs (guide objects carry meta_data {'type': 'guide'})."""
    images = [d for d in data_objects if d.get("meta_data", {}).get("type") != "guide"]
    guides = [d for d in data_objects if d.get("meta_data", {}).get("type") == "guide"]
    output_objects = []
    for data_object in images:
        img = read_image(data_object["path"])
        guide = read_image(guides[0]["path"]) if guides else None
        results, _ = run_cardiac_segmentation(img, guide, settings)
        for name, mask in results.items():
            out_path = os.path.join(working_dir, f"{name}.nii.gz")
            write_image(mask, out_path)
            output_objects.append({"path": out_path, "parent_id": data_object["id"]})
    return output_objects
