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

    # jacobian determinant of phi = id + u (folding where det <= 0)
    sx, sy, sz = fixed.spacing  # (x, y, z) mm
    jac = np.zeros(dvf_arr.shape[:3] + (3, 3), np.float64)
    spacing_zyx = (sz, sy, sx)
    for c in range(3):  # displacement component (x, y, z)
        gz, gy, gx = np.gradient(dvf_arr[..., c], *spacing_zyx)
        # row = component, column = derivative direction in (x, y, z)
        jac[..., c, 0] = gx
        jac[..., c, 1] = gy
        jac[..., c, 2] = gz
    jac += np.eye(3)
    det = np.linalg.det(jac)

    # inverse-consistency error: |u(x + v(x)) + v(x)| with v the fixed-point
    # inverse (the reference's plastimatch workflow reports landmark TRE; the
    # field-level equivalents below need no landmark detector)
    from platipy_tpu.core.resample import invert_displacement_field, warp_image

    inv = invert_displacement_field(dvf)
    residual = np.asarray(warp_image(dvf, inv).array) + np.asarray(inv.array)
    ice = np.linalg.norm(residual, axis=-1)

    stats = {
        "max_displacement_mm": float(mag.max()),
        "mean_displacement_mm": float(mag.mean()),
        "p99_displacement_mm": float(np.percentile(mag, 99)),
        "jacobian_det_min": float(det.min()),
        "jacobian_det_mean": float(det.mean()),
        "folding_fraction": float((det <= 0).mean()),
        "inverse_consistency_mean_mm": float(ice.mean()),
        "inverse_consistency_p95_mm": float(np.percentile(ice, 95)),
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
