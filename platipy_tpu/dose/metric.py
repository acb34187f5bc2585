"""Point dose metrics (reference: platipy/imaging/dose/metric.py:20-183)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from platipy_tpu.core.image import Image
from platipy_tpu.core.resample import resample

__all__ = [
    "calculate_d_mean",
    "calculate_d_max",
    "calculate_d_to_volume",
    "calculate_v_receiving_dose",
    "calculate_d_to_volume_for_labels",
    "calculate_v_receiving_dose_for_labels",
]


def _masked_dose(dose_grid: Image, label: Image):
    dose_grid = resample(dose_grid, label, None, interp="linear")
    dose_array = np.asarray(dose_grid.array)
    mask_array = np.asarray(label.array)
    return dose_array, mask_array


def calculate_d_mean(dose_grid: Image, label: Image) -> float:
    dose_array, mask_array = _masked_dose(dose_grid, label)
    return float(dose_array[mask_array > 0].mean())


def calculate_d_max(dose_grid: Image, label: Image) -> float:
    dose_array, mask_array = _masked_dose(dose_grid, label)
    return float(dose_array[mask_array > 0].max())


def calculate_d_to_volume(dose_grid: Image, label: Image, volume,
                          volume_in_cc: bool = False) -> float:
    dose_array, mask_array = _masked_dose(dose_grid, label)
    if volume_in_cc:
        volume = (
            volume * 1000 / ((mask_array > 0).sum() * np.prod(label.spacing))
        ) * 100
    if volume > 100:
        volume = 100
    return float(np.percentile(dose_array[mask_array > 0], 100 - volume))


def calculate_v_receiving_dose(dose_grid: Image, label: Image, dose_threshold: float,
                               relative: bool = True) -> float:
    dose_array, mask_array = _masked_dose(dose_grid, label)
    dose_array_masked = dose_array[mask_array > 0]
    num_voxels = (mask_array > 0).sum()
    relative_volume = (dose_array_masked >= dose_threshold).sum() / num_voxels * 100
    if relative:
        return float(relative_volume)
    total_volume = (mask_array > 0).sum() * np.prod(label.spacing) / 1000
    # relative_volume is a percentage — scale by the fraction.  DELIBERATE
    # deviation from the reference, whose metric.py:111 multiplies by the
    # percent (returning cc values 100x too large, contradicting its own
    # "volume in cc" docstring).
    return float(relative_volume / 100.0 * total_volume)


def calculate_d_to_volume_for_labels(dose_grid: Image, labels: dict, volume,
                                     volume_in_cc: bool = False) -> pd.DataFrame:
    if not isinstance(volume, list):
        volume = [volume]
    metrics = []
    for label in labels:
        m = {"label": label}
        for v in volume:
            col_name = f"D{v}cc" if volume_in_cc else f"D{v}"
            m[col_name] = calculate_d_to_volume(
                dose_grid, labels[label], v, volume_in_cc=volume_in_cc
            )
        metrics.append(m)
    return pd.DataFrame(metrics)


def calculate_v_receiving_dose_for_labels(dose_grid: Image, labels: dict,
                                          dose_threshold, relative: bool = True
                                          ) -> pd.DataFrame:
    if not isinstance(dose_threshold, list):
        dose_threshold = [dose_threshold]
    metrics = []
    for label in labels:
        m = {"label": label}
        for dt in dose_threshold:
            metric_name = f"V{dt}"
            if dt - int(dt) == 0:
                metric_name = f"V{int(dt)}"
            m[metric_name] = calculate_v_receiving_dose(
                dose_grid, labels[label], dt, relative
            )
        metrics.append(m)
    return pd.DataFrame(metrics)
