"""Dose-volume histograms (reference: platipy/imaging/dose/dvh.py:20-253)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from platipy_tpu.core.image import Image
from platipy_tpu.core.resample import resample

__all__ = ["calculate_dvh", "calculate_dvh_for_labels", "calculate_d_x",
           "calculate_v_x", "calculate_d_cc_x"]


def calculate_dvh(dose_grid: Image, label: Image, bins=1001):
    """Dose-volume histogram: returns (bin midpoints, reverse-cumulative values)."""
    if dose_grid.size != label.size:
        dose_grid = resample(dose_grid, label, None, interp="linear")

    dose_arr = np.asarray(dose_grid.array)
    label_arr = np.asarray(label.array)

    dose_vals = dose_arr[np.where(label_arr)]

    counts, bin_edges = np.histogram(dose_vals, bins=bins)
    bins = (bin_edges[1:] + bin_edges[:-1]) / 2.0

    values = np.cumsum(counts[::-1])[::-1]
    if np.all(values == 0):
        return bins, values

    values = values / values.max()
    return bins, values


def calculate_dvh_for_labels(dose_grid: Image, labels: dict, bin_width: float = 0.1,
                             max_dose=None) -> pd.DataFrame:
    """Multi-label DVH DataFrame with cc and mean dose columns."""
    dvh = []
    label_keys = labels.keys()

    dose_grid = resample(dose_grid, labels[list(label_keys)[0]], None, interp="linear")
    dose_array = np.asarray(dose_grid.array)

    if not max_dose:
        max_dose = dose_array.max()

    for k in label_keys:
        mask = labels[k]
        mask_array = np.asarray(mask.array)

        cc = mask_array.sum() * np.prod([a / 10 for a in mask.spacing])

        bins, values = calculate_dvh(
            dose_grid, labels[k],
            bins=np.arange(-bin_width / 2, max_dose + bin_width, bin_width),
        )
        bins = np.round(bins.astype(float), decimals=10)

        mean_dose = dose_array[mask_array > 0].mean() if (mask_array > 0).any() else 0.0
        entry = {
            **{"label": k, "cc": cc, "mean": mean_dose},
            **dict(zip(bins, values)),
        }
        dvh.append(entry)

    return pd.DataFrame(dvh)


def calculate_d_x(dvh: pd.DataFrame, x, label=None) -> pd.DataFrame:
    """Dose received by x percent of the volume (reference dvh.py:117-160)."""
    if label:
        dvh = dvh[dvh.label == label]
    if not isinstance(x, list):
        x = [x]

    bins = np.array([b for b in dvh.columns if isinstance(b, float)])
    values = np.array(dvh[bins])

    metrics = []
    for idx in range(len(dvh)):
        d = dvh.iloc[idx]
        m = {"label": d.label}
        for threshold in x:
            value = np.interp(threshold / 100, values[idx][::-1], bins[::-1])
            if values[idx, 0] == np.sum(values[idx]):
                value = 0
            if threshold == 100:
                i, j = np.where(values == 1.0)
                value = bins[j][i == idx][-1]
            m[f"D{threshold}"] = value
        metrics.append(m)

    return pd.DataFrame(metrics)


def calculate_v_x(dvh: pd.DataFrame, x, label=None) -> pd.DataFrame:
    """Volume (cc) receiving x dose (reference dvh.py:163-202)."""
    if label:
        dvh = dvh[dvh.label == label]
    if not isinstance(x, list):
        x = [x]

    bins = np.array([b for b in dvh.columns if isinstance(b, float)])
    values = np.array(dvh[bins])

    metrics = []
    for idx in range(len(dvh)):
        d = dvh.iloc[idx]
        m = {"label": d.label}
        for threshold in x:
            value = np.interp(threshold, bins, values[idx]) * d.cc
            metric_name = f"V{threshold}"
            if threshold - int(threshold) == 0:
                metric_name = f"V{int(threshold)}"
            m[metric_name] = value
        metrics.append(m)

    return pd.DataFrame(metrics)


def calculate_d_cc_x(dvh: pd.DataFrame, x, label=None, index_cols=None) -> pd.DataFrame:
    """Dose received by x cc of the volume (reference dvh.py:205-253)."""
    if index_cols is None:
        index_cols = ["label"]
    if label:
        dvh = dvh[dvh.label == label]
    if not isinstance(x, list):
        x = [x]

    metrics = []
    # drop_duplicates instead of groupby().groups: pandas is changing the key
    # type for single-column list groupbys (scalar -> 1-tuple), and only the
    # distinct key combinations are needed here
    for idx in dvh[index_cols].drop_duplicates().itertuples(index=False):
        idx = tuple(idx)
        m = {}
        group = dvh
        for i, col in enumerate(index_cols):
            m[col] = idx[i]
            group = group[group[col] == idx[i]]
        for threshold in x:
            cc_at = (threshold / group.cc.iloc[0]) * 100
            cc_at = min(cc_at, 100)
            cc_val = calculate_d_x(group, cc_at)[f"D{cc_at}"].iloc[0]
            m[f"D{threshold}cc"] = cc_val
        metrics.append(m)

    return pd.DataFrame(metrics)
