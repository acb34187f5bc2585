"""Radiomics feature extraction service (reference: services/radiomics/service.py:76).

Feature classes (first order, shape, GLCM, GLRLM) come from the framework's
native ``platipy_tpu.radiomics`` module — no pyradiomics dependency.
"""

import csv
import logging
import os

import numpy as np

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image
from platipy_tpu.radiomics import extract_features

logger = logging.getLogger(__name__)

RADIOMICS_SETTINGS_DEFAULTS = {
    # feature classes to extract (reference service's "radiomics" dict keys).
    # "custom" (25/75 percentiles, radiomics_custom.py) is available but NOT a
    # default: the reference service only computes RadiomicsCustom when
    # explicitly requested in the settings.
    "classes": ["firstorder", "shape", "glcm", "glrlm", "glszm", "ngtdm", "gldm"],
    "bins": 32,
}


def first_order_features(image, mask, bins=64):
    vals = np.asarray(image.array)[np.asarray(mask.array) > 0]
    if vals.size == 0:
        return {}
    hist, _ = np.histogram(vals, bins=bins, density=True)
    hist = hist[hist > 0]
    return {
        "mean": float(vals.mean()),
        "median": float(np.median(vals)),
        "std": float(vals.std()),
        "min": float(vals.min()),
        "max": float(vals.max()),
        "energy": float((vals.astype(np.float64) ** 2).sum()),
        "entropy": float(-(hist * np.log2(hist)).sum()),
        "volume_cc": float(vals.size * np.prod(mask.spacing) / 1000.0),
    }


@app.register("Radiomics", default_settings=RADIOMICS_SETTINGS_DEFAULTS)
def radiomics_service(data_objects, working_dir, settings):
    """Inputs: one image (meta type 'image') + mask objects; outputs a CSV."""
    images = [d for d in data_objects if d.get("meta_data", {}).get("type") != "mask"]
    masks = [d for d in data_objects if d.get("meta_data", {}).get("type") == "mask"]
    if not images or not masks:
        raise ValueError("Radiomics requires one image and at least one mask object")

    image = read_image(images[0]["path"])
    rows = []
    for m in masks:
        mask = read_image(m["path"])
        feats = extract_features(
            image, mask,
            classes=tuple(settings.get("classes",
                                       RADIOMICS_SETTINGS_DEFAULTS["classes"])),
            bins=int(settings.get("bins", 32)),
        )
        feats["structure"] = os.path.basename(m["path"])
        rows.append(feats)

    out_path = os.path.join(working_dir, "radiomics.csv")
    with open(out_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=sorted(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return [{"path": out_path, "parent_id": images[0]["id"]}]
