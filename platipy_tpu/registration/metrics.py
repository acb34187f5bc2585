"""Differentiable similarity metrics for registration.

TPU-native equivalents of the ITK v4 metric classes selected at reference
linear.py:141-148 and deformable.py:476-485: mean squares, (negative
normalised) correlation, Mattes / joint-histogram mutual information via
Parzen soft-binning.  All are pure jnp functions of (fixed, warped_moving,
weight) and differentiate through the resampler — which is what replaces ITK's
sampled finite-difference derivatives with exact analytic gradients.

Each metric returns a value to MINIMISE (matching ITK's convention where the
optimiser minimises: mean-squares >= 0, correlation = -NCC^2, MI metrics
return -MI).
"""

from __future__ import annotations


import jax.numpy as jnp

__all__ = ["mean_squares", "correlation", "mattes_mi", "joint_hist_mi", "get_metric", "demons_metric"]

_EPS = 1e-8


def _weighted_mean(x, w, wsum):
    return jnp.sum(x * w) / wsum


def mean_squares(fixed, moving, weight=None):
    if weight is None:
        return jnp.mean((fixed - moving) ** 2)
    wsum = jnp.maximum(jnp.sum(weight), _EPS)
    return jnp.sum(weight * (fixed - moving) ** 2) / wsum


def demons_metric(fixed, moving, weight=None):
    """ITK 'demons' metric (intensity difference) — same as mean squares."""
    return mean_squares(fixed, moving, weight)


def correlation(fixed, moving, weight=None):
    """Negative squared normalised cross-correlation (ITK Correlationv4)."""
    if weight is None:
        weight = jnp.ones_like(fixed)
    wsum = jnp.maximum(jnp.sum(weight), _EPS)
    mf = _weighted_mean(fixed, weight, wsum)
    mm = _weighted_mean(moving, weight, wsum)
    fc = (fixed - mf) * weight
    mc = (moving - mm) * weight
    num = jnp.sum(fc * (moving - mm))
    den = jnp.sqrt(jnp.sum(fc * (fixed - mf)) * jnp.sum(mc * (moving - mm))) + _EPS
    ncc = num / den
    return -(ncc * ncc)


def _parzen_histogram(fixed, moving, weight, bins: int):
    """Soft (cubic B-spline Parzen window) joint histogram, differentiable."""
    if weight is None:
        weight = jnp.ones_like(fixed)
    w = weight.reshape(-1)
    f = fixed.reshape(-1)
    m = moving.reshape(-1)

    def normalise(x):
        lo = jnp.min(jnp.where(w > 0, x, jnp.inf))
        hi = jnp.max(jnp.where(w > 0, x, -jnp.inf))
        return (x - lo) / jnp.maximum(hi - lo, _EPS) * (bins - 1)

    fu = normalise(f)
    mu = normalise(m)

    centers = jnp.arange(bins, dtype=fixed.dtype)

    def bspline3(t):
        at = jnp.abs(t)
        return jnp.where(
            at < 1.0,
            (4.0 - 6.0 * at**2 + 3.0 * at**3) / 6.0,
            jnp.where(at < 2.0, ((2.0 - at) ** 3) / 6.0, 0.0),
        )

    # [N, bins] window weights — N*bins*2 elementwise, fine for level-res images
    wf = bspline3(fu[:, None] - centers[None, :]) * w[:, None]
    wm = bspline3(mu[:, None] - centers[None, :])
    joint = wf.T @ wm  # [bins, bins]
    joint = joint / jnp.maximum(jnp.sum(joint), _EPS)
    return joint


def mattes_mi(fixed, moving, weight=None, bins: int = 50):
    """Negative mutual information with Parzen windows (Mattes et al.)."""
    joint = _parzen_histogram(fixed, moving, weight, bins)
    pf = jnp.sum(joint, axis=1, keepdims=True)
    pm = jnp.sum(joint, axis=0, keepdims=True)
    mi = jnp.sum(
        jnp.where(joint > _EPS, joint * (jnp.log(joint + _EPS) - jnp.log(pf + _EPS) - jnp.log(pm + _EPS)), 0.0)
    )
    return -mi


def joint_hist_mi(fixed, moving, weight=None, bins: int = 20,
                  variance_for_smoothing: float = 1.5):
    """Negative joint-histogram mutual information, ITK
    ``JointHistogramMutualInformationImageToImageMetricv4`` semantics
    (selected at reference linear.py:146-148 with the SimpleITK defaults
    ``numberOfHistogramBins=20``, ``varianceForJointPDFSmoothing=1.5``).

    Distinct from :func:`mattes_mi`: ITK's joint-histogram metric bins each
    sample into the joint histogram directly (no cubic B-spline Parzen
    window) with a 2-bin padding margin on each intensity axis, then smooths
    the joint PDF with a discrete Gaussian of the given variance (bin units)
    before computing MI.  Here the hard binning is relaxed to a linear
    (tent) kernel — the minimal differentiable binning, so the metric keeps
    an exact gradient through the resampler; the Gaussian PDF smoothing is
    ITK's, which dominates the window shape at variance 1.5.
    """
    if weight is None:
        weight = jnp.ones_like(fixed)
    w = weight.reshape(-1)
    f = fixed.reshape(-1)
    m = moving.reshape(-1)

    # ITK padding: bin size (max-min)/(bins - 2*padding - 1), samples land in
    # [padding, bins-1-padding] so the Gaussian smoothing never clips mass
    padding = 2

    def normalise(x):
        lo = jnp.min(jnp.where(w > 0, x, jnp.inf))
        hi = jnp.max(jnp.where(w > 0, x, -jnp.inf))
        return (x - lo) / jnp.maximum(hi - lo, _EPS) * (
            bins - 1 - 2 * padding
        ) + padding

    fu = normalise(f)
    mu = normalise(m)
    centers = jnp.arange(bins, dtype=fixed.dtype)

    def tent(t):
        return jnp.maximum(1.0 - jnp.abs(t), 0.0)

    wf = tent(fu[:, None] - centers[None, :]) * w[:, None]
    wm = tent(mu[:, None] - centers[None, :])
    joint = wf.T @ wm  # [bins, bins]

    # discrete Gaussian smoothing of the joint PDF (both axes), ITK's
    # DiscreteGaussianImageFilter with zero-flux Neumann (edge) boundaries
    if variance_for_smoothing > 0:
        from platipy_tpu.core.filters import discrete_gaussian_kernel1d

        k = jnp.asarray(
            discrete_gaussian_kernel1d(float(variance_for_smoothing), 0.01, bins),
            joint.dtype,
        )
        r = (k.shape[0] - 1) // 2
        pad = jnp.pad(joint, ((r, r), (0, 0)), mode="edge")
        joint = jnp.sum(
            jnp.stack([pad[i:i + bins] for i in range(k.shape[0])]) *
            k[:, None, None], axis=0,
        )
        pad = jnp.pad(joint, ((0, 0), (r, r)), mode="edge")
        joint = jnp.sum(
            jnp.stack([pad[:, i:i + bins] for i in range(k.shape[0])]) *
            k[:, None, None], axis=0,
        )

    joint = joint / jnp.maximum(jnp.sum(joint), _EPS)
    pf = jnp.sum(joint, axis=1, keepdims=True)
    pm = jnp.sum(joint, axis=0, keepdims=True)
    mi = jnp.sum(
        jnp.where(
            joint > _EPS,
            joint * (jnp.log(joint + _EPS) - jnp.log(pf + _EPS) - jnp.log(pm + _EPS)),
            0.0,
        )
    )
    return -mi


_METRICS = {
    "mean_squares": mean_squares,
    "correlation": correlation,
    "mattes_mi": mattes_mi,
    "joint_hist_mi": joint_hist_mi,
    "demons": demons_metric,
    "mutual_information": mattes_mi,
}


def get_metric(name: str):
    try:
        return _METRICS[name.lower()]
    except KeyError:
        raise ValueError(
            f"Unknown metric {name!r}; available: {sorted(_METRICS)}"
        ) from None
