"""Native radiomics feature extraction.

The reference's radiomics service delegates to pyradiomics
(reference services/radiomics/service.py:25-45: firstorder, shape, glcm,
glrlm, glszm, ngtdm, gldm).  pyradiomics is not available here, so all seven
feature classes are implemented natively on host numpy (ROIs are small; this
matches pyradiomics' own CPU execution):

* first order  — 19 intensity statistics (IBSI 3.3)
* shape        — volume/surface/sphericity/axes (IBSI 3.1, voxel-face surface)
* GLCM         — 18 Haralick co-occurrence features (IBSI 3.6)
* GLRLM        — 11 run-length features (IBSI 3.7)
* GLSZM        — 11 size-zone features (IBSI 3.8)
* NGTDM        — 5 gray-tone-difference features (IBSI 3.10)
* GLDM         — 10 dependence features (IBSI 3.11)

Feature names follow pyradiomics' conventions (``original_firstorder_Mean``
style keys from :func:`extract_features`) so downstream CSVs look familiar.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence

import numpy as np

__all__ = [
    "extract_first_order",
    "extract_shape",
    "extract_glcm",
    "extract_glrlm",
    "extract_glszm",
    "extract_ngtdm",
    "extract_gldm",
    "extract_features",
]


def _roi_values(image, mask) -> np.ndarray:
    img = np.asarray(image.array if hasattr(image, "array") else image, np.float64)
    m = np.asarray(mask.array if hasattr(mask, "array") else mask) > 0
    return img[m]


def _quantize(image, mask, bins: int, bin_width: Optional[float]):
    img = np.asarray(image.array if hasattr(image, "array") else image, np.float64)
    m = np.asarray(mask.array if hasattr(mask, "array") else mask) > 0
    # crop to the ROI bounding box (pyradiomics does the same): the texture
    # matrices walk voxels in Python loops, so a small ROI on a full-body CT
    # is minutes vs milliseconds; levels/runs only count in-mask voxels, so
    # cropping cannot change any feature value
    if m.any():
        zs, ys, xs = np.where(m)
        sl = tuple(
            slice(int(lo), int(hi) + 1)
            for lo, hi in ((zs.min(), zs.max()), (ys.min(), ys.max()),
                           (xs.min(), xs.max()))
        )
        img, m = img[sl], m[sl]
    vals = img[m]
    lo = vals.min()
    if bin_width:
        q = np.floor((img - lo) / bin_width).astype(np.int64)
        n_levels = int(q[m].max()) + 1
    else:
        hi = vals.max()
        span = max(hi - lo, 1e-9)
        q = np.minimum((img - lo) / span * bins, bins - 1).astype(np.int64)
        n_levels = bins
    q = q + 1  # gray levels 1..N, 0 = outside
    q[~m] = 0
    return q, n_levels


# ---------------------------------------------------------------------------
# first order (IBSI 3.3)
# ---------------------------------------------------------------------------

def extract_first_order(image, mask, bins: int = 64) -> Dict[str, float]:
    vals = _roi_values(image, mask)
    if vals.size == 0:
        return {}
    spacing = getattr(mask, "spacing", (1.0, 1.0, 1.0))
    voxel_volume = float(np.prod(spacing))
    hist, _ = np.histogram(vals, bins=bins)
    p = hist / hist.sum()
    p_nz = p[p > 0]
    mean = vals.mean()
    p10, p90 = np.percentile(vals, [10, 90])
    robust = vals[(vals >= p10) & (vals <= p90)]
    return {
        "Energy": float((vals**2).sum()),
        "TotalEnergy": float((vals**2).sum() * voxel_volume),
        "Entropy": float(-(p_nz * np.log2(p_nz)).sum()),
        "Minimum": float(vals.min()),
        "10Percentile": float(p10),
        "90Percentile": float(p90),
        "Maximum": float(vals.max()),
        "Mean": float(mean),
        "Median": float(np.median(vals)),
        "InterquartileRange": float(np.percentile(vals, 75) - np.percentile(vals, 25)),
        "Range": float(vals.max() - vals.min()),
        "MeanAbsoluteDeviation": float(np.abs(vals - mean).mean()),
        "RobustMeanAbsoluteDeviation": float(
            np.abs(robust - robust.mean()).mean() if robust.size else 0.0
        ),
        "RootMeanSquared": float(np.sqrt((vals**2).mean())),
        "StandardDeviation": float(vals.std()),
        "Skewness": float(
            ((vals - mean) ** 3).mean() / max(vals.std() ** 3, 1e-12)
        ),
        "Kurtosis": float(
            ((vals - mean) ** 4).mean() / max(vals.var() ** 2, 1e-12)
        ),
        "Variance": float(vals.var()),
        "Uniformity": float((p**2).sum()),
    }


# ---------------------------------------------------------------------------
# shape (IBSI 3.1)
# ---------------------------------------------------------------------------

def extract_shape(mask) -> Dict[str, float]:
    m = np.asarray(mask.array if hasattr(mask, "array") else mask) > 0
    if not m.any():
        return {}
    spacing = np.asarray(getattr(mask, "spacing", (1.0, 1.0, 1.0)), np.float64)
    sx, sy, sz = spacing  # (x, y, z)
    voxel_volume = float(sx * sy * sz)
    n = int(m.sum())
    volume = n * voxel_volume

    # surface area: exposed voxel faces (z, y, x face areas)
    pad = np.pad(m, 1)
    face_areas = {
        0: sx * sy,  # z-normal faces
        1: sx * sz,  # y-normal faces
        2: sy * sz,  # x-normal faces
    }
    surface = 0.0
    for axis, area in face_areas.items():
        fwd = np.logical_and(m, ~np.roll(pad, -1, axis)[1:-1, 1:-1, 1:-1])
        bwd = np.logical_and(m, ~np.roll(pad, 1, axis)[1:-1, 1:-1, 1:-1])
        surface += (fwd.sum() + bwd.sum()) * area

    # physical coordinates of foreground voxels (z,y,x index -> mm)
    zz, yy, xx = np.nonzero(m)
    pts = np.stack([xx * sx, yy * sy, zz * sz], axis=1)
    centroid = pts.mean(axis=0)
    centered = pts - centroid
    cov = centered.T @ centered / n
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1]  # major, minor, least
    eig = np.maximum(eig, 0.0)
    axis_lengths = 4.0 * np.sqrt(eig)

    # max 3D diameter from surface voxels (subsampled for big ROIs)
    surf_mask = np.logical_and(
        m, ~np.all([np.roll(pad, s, a)[1:-1, 1:-1, 1:-1]
                    for a in (0, 1, 2) for s in (1, -1)], axis=0)
    )
    szz, syy, sxx = np.nonzero(surf_mask)
    spts = np.stack([sxx * sx, syy * sy, szz * sz], axis=1)
    if len(spts) > 2000:
        idx = np.random.RandomState(0).choice(len(spts), 2000, replace=False)
        spts = spts[idx]
    d2 = ((spts[:, None, :] - spts[None, :, :]) ** 2).sum(-1)
    max_diam = float(np.sqrt(d2.max())) if len(spts) else 0.0

    sphere_surface = (36.0 * np.pi * volume**2) ** (1.0 / 3.0)
    return {
        "MeshVolume": volume,
        "VoxelVolume": volume,
        "SurfaceArea": float(surface),
        "SurfaceVolumeRatio": float(surface / volume),
        "Sphericity": float(sphere_surface / surface),
        "Compactness1": float(volume / np.sqrt(np.pi * surface**3)),
        "Compactness2": float(36.0 * np.pi * volume**2 / surface**3),
        "SphericalDisproportion": float(surface / sphere_surface),
        "Maximum3DDiameter": max_diam,
        "MajorAxisLength": float(axis_lengths[0]),
        "MinorAxisLength": float(axis_lengths[1]),
        "LeastAxisLength": float(axis_lengths[2]),
        "Elongation": float(np.sqrt(eig[1] / max(eig[0], 1e-12))),
        "Flatness": float(np.sqrt(eig[2] / max(eig[0], 1e-12))),
    }


# ---------------------------------------------------------------------------
# GLCM (IBSI 3.6) — 13 3-D directions, distance 1, symmetric
# ---------------------------------------------------------------------------

_DIRECTIONS_3D = [
    (0, 0, 1), (0, 1, 0), (1, 0, 0),
    (0, 1, 1), (0, 1, -1), (1, 0, 1), (1, 0, -1),
    (1, 1, 0), (1, -1, 0),
    (1, 1, 1), (1, 1, -1), (1, -1, 1), (1, -1, -1),
]


def _glcm_matrix(q: np.ndarray, n_levels: int, offset) -> np.ndarray:
    dz, dy, dx = offset
    nz, ny, nx = q.shape
    a = q[max(dz, 0) : nz + min(dz, 0), max(dy, 0) : ny + min(dy, 0),
          max(dx, 0) : nx + min(dx, 0)]
    b = q[max(-dz, 0) : nz + min(-dz, 0), max(-dy, 0) : ny + min(-dy, 0),
          max(-dx, 0) : nx + min(-dx, 0)]
    valid = (a > 0) & (b > 0)
    i, j = a[valid] - 1, b[valid] - 1
    p = np.zeros((n_levels, n_levels), np.float64)
    np.add.at(p, (i, j), 1.0)
    return p + p.T  # symmetric


def extract_glcm(image, mask, bins: int = 32,
                 bin_width: Optional[float] = None) -> Dict[str, float]:
    q, n_levels = _quantize(image, mask, bins, bin_width)
    mats = [_glcm_matrix(q, n_levels, d) for d in _DIRECTIONS_3D]
    feats: Dict[str, list] = {}
    levels = np.arange(1, n_levels + 1, dtype=np.float64)
    ii, jj = np.meshgrid(levels, levels, indexing="ij")
    for p in mats:
        total = p.sum()
        if total == 0:
            continue
        p = p / total
        px = p.sum(1)
        mu_x = (levels * px).sum()
        sd_x = np.sqrt(((levels - mu_x) ** 2 * px).sum())
        p_nz = p[p > 0]
        k_sum = np.arange(2, 2 * n_levels + 1, dtype=np.float64)
        p_sum = np.array([p[ii + jj == k].sum() for k in k_sum])
        k_diff = np.arange(0, n_levels, dtype=np.float64)
        p_diff = np.array([p[np.abs(ii - jj) == k].sum() for k in k_diff])
        mu_sum = (k_sum * p_sum).sum()
        d_avg = (k_diff * p_diff).sum()
        vals = {
            "Autocorrelation": (ii * jj * p).sum(),
            "JointAverage": (ii * p).sum(),
            "ClusterProminence": (((ii + jj - 2 * mu_x) ** 4) * p).sum(),
            "ClusterShade": (((ii + jj - 2 * mu_x) ** 3) * p).sum(),
            "ClusterTendency": (((ii + jj - 2 * mu_x) ** 2) * p).sum(),
            "Contrast": (((ii - jj) ** 2) * p).sum(),
            "Correlation": (
                ((ii - mu_x) * (jj - mu_x) * p).sum() / max(sd_x**2, 1e-12)
            ),
            "DifferenceAverage": d_avg,
            "DifferenceEntropy": -(p_diff[p_diff > 0]
                                   * np.log2(p_diff[p_diff > 0])).sum(),
            "DifferenceVariance": (((k_diff - d_avg) ** 2) * p_diff).sum(),
            "JointEnergy": (p**2).sum(),
            "JointEntropy": -(p_nz * np.log2(p_nz)).sum(),
            "Idm": (p / (1.0 + (ii - jj) ** 2)).sum(),
            "Id": (p / (1.0 + np.abs(ii - jj))).sum(),
            "InverseVariance": (
                p[ii != jj] / ((ii - jj)[ii != jj] ** 2)
            ).sum(),
            "MaximumProbability": p.max(),
            "SumAverage": mu_sum,
            "SumEntropy": -(p_sum[p_sum > 0] * np.log2(p_sum[p_sum > 0])).sum(),
        }
        for k, v in vals.items():
            feats.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in feats.items()}


# ---------------------------------------------------------------------------
# GLRLM (IBSI 3.7)
# ---------------------------------------------------------------------------

def _run_lengths(line: np.ndarray, n_levels: int, out: np.ndarray) -> None:
    """Accumulate run lengths of one 1-D gray-level line into out[level-1, len-1]."""
    n = len(line)
    i = 0
    while i < n:
        g = line[i]
        j = i + 1
        while j < n and line[j] == g:
            j += 1
        if g > 0:
            out[g - 1, min(j - i, out.shape[1]) - 1] += 1
        i = j


def extract_glrlm(image, mask, bins: int = 32,
                  bin_width: Optional[float] = None) -> Dict[str, float]:
    q, n_levels = _quantize(image, mask, bins, bin_width)
    max_run = max(q.shape)
    feats: Dict[str, list] = {}
    n_voxels = int((q > 0).sum())
    for d in _DIRECTIONS_3D:
        r = np.zeros((n_levels, max_run), np.float64)
        lines = _lines_along(q, d)
        for line in lines:
            _run_lengths(line, n_levels, r)
        n_runs = r.sum()
        if n_runs == 0:
            continue
        lengths = np.arange(1, max_run + 1, dtype=np.float64)
        levels = np.arange(1, n_levels + 1, dtype=np.float64)
        rj = r.sum(0)  # per length
        ri = r.sum(1)  # per level
        vals = {
            "ShortRunEmphasis": (rj / lengths**2).sum() / n_runs,
            "LongRunEmphasis": (rj * lengths**2).sum() / n_runs,
            "GrayLevelNonUniformity": (ri**2).sum() / n_runs,
            "GrayLevelNonUniformityNormalized": (ri**2).sum() / n_runs**2,
            "RunLengthNonUniformity": (rj**2).sum() / n_runs,
            "RunLengthNonUniformityNormalized": (rj**2).sum() / n_runs**2,
            "RunPercentage": n_runs / max(n_voxels, 1),
            "GrayLevelVariance": float(
                (((levels - (levels * ri / n_runs).sum()) ** 2) * ri / n_runs).sum()
            ),
            "RunVariance": float(
                (((lengths - (lengths * rj / n_runs).sum()) ** 2) * rj / n_runs).sum()
            ),
            "LowGrayLevelRunEmphasis": (ri / levels**2).sum() / n_runs,
            "HighGrayLevelRunEmphasis": (ri * levels**2).sum() / n_runs,
        }
        for k, v in vals.items():
            feats.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in feats.items()}


def _lines_along(q: np.ndarray, direction) -> Iterable[np.ndarray]:
    """All maximal 1-D lines of q along a (dz,dy,dx) unit direction."""
    dz, dy, dx = direction
    nz, ny, nx = q.shape
    if (dz, dy, dx) == (0, 0, 1):
        return list(q.reshape(-1, nx))
    if (dz, dy, dx) == (0, 1, 0):
        return list(np.transpose(q, (0, 2, 1)).reshape(-1, ny))
    if (dz, dy, dx) == (1, 0, 0):
        return list(np.transpose(q, (1, 2, 0)).reshape(-1, nz))
    # diagonal directions: walk per start voxel on the entry faces
    lines = []
    steps = np.asarray(direction)
    starts = []
    for z in range(nz):
        for y in range(ny):
            for x in range(nx):
                prev = (z - dz, y - dy, x - dx)
                if not (0 <= prev[0] < nz and 0 <= prev[1] < ny and 0 <= prev[2] < nx):
                    starts.append((z, y, x))
    for z, y, x in starts:
        line = []
        while 0 <= z < nz and 0 <= y < ny and 0 <= x < nx:
            line.append(q[z, y, x])
            z, y, x = z + dz, y + dy, x + dx
        lines.append(np.asarray(line))
    return lines


def extract_features(image, mask,
                     classes: Sequence[str] = ("firstorder", "shape", "glcm",
                                               "glrlm", "glszm", "ngtdm", "gldm"),
                     bins: int = 32) -> Dict[str, float]:
    """pyradiomics-style flat feature dict with ``original_<class>_<Name>``
    keys (reference services/radiomics/service.py:76-170 output shape)."""
    out: Dict[str, float] = {}
    if "firstorder" in classes:
        for k, v in extract_first_order(image, mask, bins=max(bins, 64)).items():
            out[f"original_firstorder_{k}"] = v
    if "shape" in classes:
        for k, v in extract_shape(mask).items():
            out[f"original_shape_{k}"] = v
    if "glcm" in classes:
        for k, v in extract_glcm(image, mask, bins=bins).items():
            out[f"original_glcm_{k}"] = v
    if "glrlm" in classes:
        for k, v in extract_glrlm(image, mask, bins=bins).items():
            out[f"original_glrlm_{k}"] = v
    if "glszm" in classes:
        for k, v in extract_glszm(image, mask, bins=bins).items():
            out[f"original_glszm_{k}"] = v
    if "ngtdm" in classes:
        for k, v in extract_ngtdm(image, mask, bins=bins).items():
            out[f"original_ngtdm_{k}"] = v
    if "gldm" in classes:
        for k, v in extract_gldm(image, mask, bins=bins).items():
            out[f"original_gldm_{k}"] = v
    if "custom" in classes:
        for k, v in extract_custom(image, mask).items():
            out[f"original_custom_{k}"] = v
    return out


def extract_custom(image, mask) -> Dict[str, float]:
    """The reference's RadiomicsCustom class: 25th/75th intensity percentiles
    (reference services/radiomics/radiomics_custom.py:26-32).

    Deliberate divergence: an EMPTY ROI returns {} (the two percentile keys
    absent) where the reference raises from np.percentile on an empty array —
    consumers must not rely on the keys always being present."""
    vals = _roi_values(image, mask)
    if vals.size == 0:
        return {}
    return {
        "25Percentile": float(np.percentile(vals, 25)),
        "75Percentile": float(np.percentile(vals, 75)),
    }


# ---------------------------------------------------------------------------
# GLSZM (IBSI 3.8) — gray-level size-zone matrix
# ---------------------------------------------------------------------------

def extract_glszm(image, mask, bins: int = 32,
                  bin_width: Optional[float] = None) -> Dict[str, float]:
    from scipy import ndimage as ndi

    q, n_levels = _quantize(image, mask, bins, bin_width)
    n_voxels = int((q > 0).sum())
    max_zone = max(n_voxels, 1)
    structure = np.ones((3, 3, 3), bool)  # 26-connected zones
    zone_counts: Dict[tuple, int] = {}
    for level in range(1, n_levels + 1):
        lab, n = ndi.label(q == level, structure=structure)
        if n == 0:
            continue
        sizes = np.bincount(lab.ravel())[1:]
        for s in sizes:
            zone_counts[(level, int(s))] = zone_counts.get((level, int(s)), 0) + 1
    if not zone_counts:
        return {}
    levels = np.array([k[0] for k in zone_counts], np.float64)
    sizes = np.array([k[1] for k in zone_counts], np.float64)
    counts = np.array(list(zone_counts.values()), np.float64)
    n_zones = counts.sum()
    ri = np.zeros(n_levels + 1)
    np.add.at(ri, levels.astype(int), counts)
    return {
        "SmallAreaEmphasis": float((counts / sizes**2).sum() / n_zones),
        "LargeAreaEmphasis": float((counts * sizes**2).sum() / n_zones),
        "GrayLevelNonUniformity": float((ri**2).sum() / n_zones),
        "GrayLevelNonUniformityNormalized": float((ri**2).sum() / n_zones**2),
        "SizeZoneNonUniformity": float(
            sum(counts[sizes == s].sum() ** 2 for s in np.unique(sizes)) / n_zones
        ),
        "ZonePercentage": float(n_zones / max_zone),
        "GrayLevelVariance": float(
            (((levels - (levels * counts / n_zones).sum()) ** 2)
             * counts / n_zones).sum()
        ),
        "ZoneVariance": float(
            (((sizes - (sizes * counts / n_zones).sum()) ** 2)
             * counts / n_zones).sum()
        ),
        "ZoneEntropy": float(
            -(counts / n_zones * np.log2(counts / n_zones)).sum()
        ),
        "LowGrayLevelZoneEmphasis": float((counts / levels**2).sum() / n_zones),
        "HighGrayLevelZoneEmphasis": float((counts * levels**2).sum() / n_zones),
    }


# ---------------------------------------------------------------------------
# NGTDM (IBSI 3.10) — neighbourhood gray-tone difference
# ---------------------------------------------------------------------------

def extract_ngtdm(image, mask, bins: int = 32,
                  bin_width: Optional[float] = None) -> Dict[str, float]:
    q, n_levels = _quantize(image, mask, bins, bin_width)
    m = q > 0
    qf = q.astype(np.float64)
    # 26-neighbourhood mean of valid neighbours; shifts run on a zero-padded
    # copy so np.roll cannot wrap opposite volume faces into the
    # neighbourhood of boundary-touching ROI voxels
    qf_p = np.pad(qf, 1)
    m_p = np.pad(m, 1)
    acc_p = np.zeros_like(qf_p)
    cnt_p = np.zeros(qf_p.shape, np.int64)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == dy == dx == 0:
                    continue
                sh = np.roll(np.roll(np.roll(qf_p, dz, 0), dy, 1), dx, 2)
                shm = np.roll(np.roll(np.roll(m_p, dz, 0), dy, 1), dx, 2)
                acc_p += np.where(shm, sh, 0.0)
                cnt_p += shm
    acc = acc_p[1:-1, 1:-1, 1:-1]
    cnt = cnt_p[1:-1, 1:-1, 1:-1]
    valid = m & (cnt > 0)
    nbr_mean = np.where(valid, acc / np.maximum(cnt, 1), 0.0)
    n_v = int(valid.sum())
    if n_v == 0:
        return {}
    s = np.zeros(n_levels + 1)
    n_i = np.zeros(n_levels + 1)
    np.add.at(s, q[valid], np.abs(qf[valid] - nbr_mean[valid]))
    np.add.at(n_i, q[valid], 1.0)
    p = n_i / n_v
    present = p > 0
    levels = np.arange(n_levels + 1, dtype=np.float64)
    n_g = int(present[1:].sum())
    ii, jj = np.meshgrid(levels, levels, indexing="ij")
    pij = np.outer(p, p)
    both = np.outer(present, present)
    coarseness = 1.0 / max((p * s).sum(), 1e-12)
    contrast = 0.0
    if n_g > 1:
        contrast = (
            (pij * (ii - jj) ** 2)[both].sum() / (n_g * (n_g - 1))
        ) * (s.sum() / n_v)
    busy_den = np.abs((ii * p[:, None] - jj * p[None, :]))[both].sum()
    busyness = (p * s).sum() / busy_den if busy_den > 0 else 0.0
    complexity = (
        (np.abs(ii - jj) * (p[:, None] * s[:, None] + p[None, :] * s[None, :])
         / (p[:, None] + p[None, :] + 1e-12))[both].sum() / n_v
    )
    strength_den = max(s.sum(), 1e-12)
    strength = ((p[:, None] + p[None, :]) * (ii - jj) ** 2)[both].sum() / strength_den
    return {
        "Coarseness": float(coarseness),
        "Contrast": float(contrast),
        "Busyness": float(busyness),
        "Complexity": float(complexity),
        "Strength": float(strength),
    }


# ---------------------------------------------------------------------------
# GLDM (IBSI 3.11) — gray-level dependence
# ---------------------------------------------------------------------------

def extract_gldm(image, mask, bins: int = 32, alpha: int = 0,
                 bin_width: Optional[float] = None) -> Dict[str, float]:
    q, n_levels = _quantize(image, mask, bins, bin_width)
    m = q > 0
    # zero-pad so rolls never wrap a face voxel's neighbourhood to the
    # opposite face (boundary-touching ROIs otherwise inflate dependence)
    q_p = np.pad(q.astype(np.int64), 1)
    m_p = np.pad(m, 1)
    dep_p = np.zeros(q_p.shape, np.int64)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == dy == dx == 0:
                    continue
                sh = np.roll(np.roll(np.roll(q_p, dz, 0), dy, 1), dx, 2)
                shm = np.roll(np.roll(np.roll(m_p, dz, 0), dy, 1), dx, 2)
                dep_p += (np.abs(sh - q_p) <= alpha) & shm & m_p
    dep = dep_p[1:-1, 1:-1, 1:-1]
    dep = dep + 1  # pyradiomics counts the centre voxel
    max_dep = 27
    mat = np.zeros((n_levels, max_dep), np.float64)
    np.add.at(mat, (q[m] - 1, np.minimum(dep[m], max_dep) - 1), 1.0)
    n_z = mat.sum()
    levels = np.arange(1, n_levels + 1, dtype=np.float64)
    deps = np.arange(1, max_dep + 1, dtype=np.float64)
    ri = mat.sum(1)
    rj = mat.sum(0)
    return {
        "SmallDependenceEmphasis": float((rj / deps**2).sum() / n_z),
        "LargeDependenceEmphasis": float((rj * deps**2).sum() / n_z),
        "GrayLevelNonUniformity": float((ri**2).sum() / n_z),
        "DependenceNonUniformity": float((rj**2).sum() / n_z),
        "DependenceNonUniformityNormalized": float((rj**2).sum() / n_z**2),
        "GrayLevelVariance": float(
            (((levels - (levels * ri / n_z).sum()) ** 2) * ri / n_z).sum()
        ),
        "DependenceVariance": float(
            (((deps - (deps * rj / n_z).sum()) ** 2) * rj / n_z).sum()
        ),
        "DependenceEntropy": float(
            -(mat[mat > 0] / n_z * np.log2(mat[mat > 0] / n_z)).sum()
        ),
        "LowGrayLevelEmphasis": float((ri / levels**2).sum() / n_z),
        "HighGrayLevelEmphasis": float((ri * levels**2).sum() / n_z),
    }
