"""Image sampling / warping — the fused gather kernel behind all resampling.

TPU-native replacement for ITK's ``ResampleImageFilter`` + interpolators
(reference call sites: /root/reference/platipy/imaging/registration/utils.py:176-189,
registration/deformable.py:130-140).  Everything here is pure jnp, jit-friendly,
static-shaped, and differentiable (trilinear/B-spline paths) — autodiff through
the sampler is what gives the registration engine analytic gradients.

Interpolator codes follow the reference's convention (utils.py docstring):
``1`` = nearest neighbour, ``2`` = linear, ``3`` = cubic B-spline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import (
    Image,
    index_to_physical_matrix,
    physical_to_index_matrix,
)

__all__ = [
    "sample_image",
    "sample_at_continuous_index",
    "grid_continuous_indices",
    "interp_name",
    "spline_coefficients",
]

INTERP_NEAREST = 1
INTERP_LINEAR = 2
INTERP_BSPLINE = 3

_INTERP_NAMES = {
    "nearest": INTERP_NEAREST,
    "nearest_neighbour": INTERP_NEAREST,
    "linear": INTERP_LINEAR,
    "bspline": INTERP_BSPLINE,
    "cubic": INTERP_BSPLINE,
    INTERP_NEAREST: INTERP_NEAREST,
    INTERP_LINEAR: INTERP_LINEAR,
    INTERP_BSPLINE: INTERP_BSPLINE,
}


def interp_name(interp) -> int:
    try:
        return _INTERP_NAMES[interp]
    except KeyError:
        raise ValueError(f"Unknown interpolator {interp!r}") from None


# ---------------------------------------------------------------------------
# continuous-index computation
# ---------------------------------------------------------------------------

def physical_to_continuous_index(points, origin, spacing, direction):
    """Map physical (x,y,z) points [...,3] to continuous (x,y,z) indices."""
    m = physical_to_index_matrix(origin, spacing, direction)
    a = jnp.asarray(m[:3, :3], dtype=points.dtype)
    b = jnp.asarray(m[:3, 3], dtype=points.dtype)
    return jnp.matmul(points, a.T, precision=jax.lax.Precision.HIGHEST) + b


def grid_continuous_indices(shape_zyx: Tuple[int, int, int], dtype=jnp.float32):
    """Index coordinate arrays (ix, iy, iz), each broadcastable to [z,y,x]."""
    nz, ny, nx = shape_zyx
    iz = jnp.arange(nz, dtype=dtype).reshape(nz, 1, 1)
    iy = jnp.arange(ny, dtype=dtype).reshape(1, ny, 1)
    ix = jnp.arange(nx, dtype=dtype).reshape(1, 1, nx)
    return ix, iy, iz


# ---------------------------------------------------------------------------
# gather helpers
# ---------------------------------------------------------------------------

def _flat_gather(array, iz, iy, ix):
    """Gather array[[z,y,x(,c)]] at integer index arrays (already clipped)."""
    nz, ny, nx = array.shape[:3]
    lin = (iz * ny + iy) * nx + ix
    if array.ndim == 3:
        return array.reshape(-1)[lin]
    return array.reshape(-1, array.shape[-1])[lin]


def _expand(w, vec: bool):
    return w[..., None] if vec else w


# ---------------------------------------------------------------------------
# interpolation at continuous indices
# ---------------------------------------------------------------------------

def sample_at_continuous_index(
    array: jnp.ndarray,
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    uz: jnp.ndarray,
    interp=INTERP_LINEAR,
    default_value: float = 0.0,
):
    """Sample ``array`` [z,y,x(,c)] at continuous (x,y,z) indices.

    ``ux/uy/uz`` share a broadcastable shape S; returns shape S (or S+[c]).
    Out-of-domain points (outside [-0.5, n-0.5], ITK's IsInsideBuffer bounds)
    return ``default_value``.
    """
    interp = interp_name(interp)
    nz, ny, nx = array.shape[:3]
    vec = array.ndim == 4
    compute_dtype = array.dtype if jnp.issubdtype(array.dtype, jnp.floating) else jnp.float32

    inside = (
        (ux >= -0.5) & (ux <= nx - 0.5)
        & (uy >= -0.5) & (uy <= ny - 0.5)
        & (uz >= -0.5) & (uz <= nz - 0.5)
    )
    ux, uy, uz = jnp.broadcast_arrays(ux, uy, uz)
    inside = jnp.broadcast_to(inside, ux.shape)

    if interp == INTERP_NEAREST:
        ix = jnp.clip(jnp.round(ux).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip(jnp.round(uy).astype(jnp.int32), 0, ny - 1)
        iz = jnp.clip(jnp.round(uz).astype(jnp.int32), 0, nz - 1)
        val = _flat_gather(array, iz, iy, ix)
    elif interp == INTERP_LINEAR:
        x0 = jnp.floor(ux)
        y0 = jnp.floor(uy)
        z0 = jnp.floor(uz)
        fx = (ux - x0).astype(compute_dtype)
        fy = (uy - y0).astype(compute_dtype)
        fz = (uz - z0).astype(compute_dtype)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, nx - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, ny - 1)
        z0i = jnp.clip(z0.astype(jnp.int32), 0, nz - 1)
        x1i = jnp.clip(x0i + 1, 0, nx - 1)
        y1i = jnp.clip(y0i + 1, 0, ny - 1)
        z1i = jnp.clip(z0i + 1, 0, nz - 1)
        arr = array.astype(compute_dtype)
        c000 = _flat_gather(arr, z0i, y0i, x0i)
        c001 = _flat_gather(arr, z0i, y0i, x1i)
        c010 = _flat_gather(arr, z0i, y1i, x0i)
        c011 = _flat_gather(arr, z0i, y1i, x1i)
        c100 = _flat_gather(arr, z1i, y0i, x0i)
        c101 = _flat_gather(arr, z1i, y0i, x1i)
        c110 = _flat_gather(arr, z1i, y1i, x0i)
        c111 = _flat_gather(arr, z1i, y1i, x1i)
        wx = _expand(fx, vec)
        wy = _expand(fy, vec)
        wz = _expand(fz, vec)
        c00 = c000 + (c001 - c000) * wx
        c01 = c010 + (c011 - c010) * wx
        c10 = c100 + (c101 - c100) * wx
        c11 = c110 + (c111 - c110) * wx
        c0 = c00 + (c01 - c00) * wy
        c1 = c10 + (c11 - c10) * wy
        val = c0 + (c1 - c0) * wz
    elif interp == INTERP_BSPLINE:
        # Cubic B-spline on prefiltered coefficients. Caller is expected to
        # pass coefficients (see spline_coefficients); sampling raw intensities
        # gives a smoothing (approximating) spline instead of interpolation.
        arr = array.astype(compute_dtype)
        x0 = jnp.floor(ux)
        y0 = jnp.floor(uy)
        z0 = jnp.floor(uz)
        tx = (ux - x0).astype(compute_dtype)
        ty = (uy - y0).astype(compute_dtype)
        tz = (uz - z0).astype(compute_dtype)
        wx = _cubic_bspline_weights(tx)  # [...,4]
        wy = _cubic_bspline_weights(ty)
        wz = _cubic_bspline_weights(tz)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        z0i = z0.astype(jnp.int32)
        val = None
        for dz in range(4):
            iz = jnp.clip(z0i + dz - 1, 0, nz - 1)
            plane = None
            for dy in range(4):
                iy = jnp.clip(y0i + dy - 1, 0, ny - 1)
                row = None
                for dx in range(4):
                    ix = jnp.clip(x0i + dx - 1, 0, nx - 1)
                    g = _flat_gather(arr, iz, iy, ix) * _expand(wx[..., dx], vec)
                    row = g if row is None else row + g
                row = row * _expand(wy[..., dy], vec)
                plane = row if plane is None else plane + row
            plane = plane * _expand(wz[..., dz], vec)
            val = plane if val is None else val + plane
    else:  # pragma: no cover
        raise ValueError(interp)

    default = jnp.asarray(default_value, dtype=val.dtype)
    mask = _expand(inside, vec)
    out = jnp.where(mask, val, default)
    return out


def _cubic_bspline_weights(t):
    t2 = t * t
    t3 = t2 * t
    w0 = (1 - 3 * t + 3 * t2 - t3) / 6.0
    w1 = (4 - 6 * t2 + 3 * t3) / 6.0
    w2 = (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0
    w3 = t3 / 6.0
    return jnp.stack([w0, w1, w2, w3], axis=-1)


# ---------------------------------------------------------------------------
# B-spline prefilter (interpolating-spline coefficients)
# ---------------------------------------------------------------------------

_SPLINE_POLE = -0.26794919243112270647  # sqrt(3) - 2, the cubic B-spline pole


def _spline_filter_1d(x, axis):
    """Causal/anti-causal recursive prefilter along ``axis`` (Unser 1993)."""
    z = _SPLINE_POLE
    n = x.shape[axis]
    if n < 2:
        return x
    x = jnp.moveaxis(x, axis, 0)
    lam = (1 - z) * (1 - 1 / z)
    x = x * lam

    # causal init (mirror boundary), truncated sum
    k = min(n, max(12, int(np.ceil(np.log(1e-10) / np.log(abs(z))))))
    powers = z ** jnp.arange(k, dtype=x.dtype)
    shape = (k,) + (1,) * (x.ndim - 1)
    c0 = jnp.sum(x[:k] * powers.reshape(shape), axis=0)

    def causal(carry, xi):
        c = xi + z * carry
        return c, c

    _, cplus = jax.lax.scan(causal, c0, x[1:])
    cplus = jnp.concatenate([c0[None], cplus], axis=0)

    # anti-causal init (mirror boundary)
    cn = (z / (z * z - 1)) * (z * cplus[-2] + cplus[-1])

    def anticausal(carry, ci):
        c = z * (carry - ci)
        return c, c

    _, cminus = jax.lax.scan(anticausal, cn, cplus[:-1][::-1])
    out = jnp.concatenate([cminus[::-1], cn[None]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def spline_coefficients(array: jnp.ndarray) -> jnp.ndarray:
    """Cubic-spline interpolation coefficients for [z,y,x(,c)] data."""
    arr = array.astype(jnp.float32)
    for axis in range(3):
        arr = _spline_filter_1d(arr, axis)
    return arr


# ---------------------------------------------------------------------------
# physical-space sampling
# ---------------------------------------------------------------------------

def sample_image(
    array: jnp.ndarray,
    points: jnp.ndarray,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    direction=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    interp=INTERP_LINEAR,
    default_value: float = 0.0,
):
    """Sample an image array at physical (x,y,z) ``points`` [...,3]."""
    u = physical_to_continuous_index(points, origin, spacing, direction)
    return sample_at_continuous_index(
        array, u[..., 0], u[..., 1], u[..., 2], interp=interp, default_value=default_value
    )


# ---------------------------------------------------------------------------
# TPU-fast warping: multipass shift-and-select
# ---------------------------------------------------------------------------
#
# XLA's generic gather runs near-scalar on TPU (~60 ns/element measured —
# 35x the elementwise floor).  For dense warps with BOUNDED displacement the
# shift-and-select form — a sum of (2D+2) statically-shifted volumes masked by
# per-voxel floor-index equality — runs entirely on the VPU at HBM speed.
#
# The 3-axis composition (x, then y, then z, offsets all evaluated at the
# output voxel) is exact when the field is locally constant over the
# displacement length scale; demons fields are Gaussian-regularised every
# iteration, so the approximation error is far below the pipeline's tolerance.
# Exact gather-based sampling remains the default for final resamples.

# shift-select taps at or below this count unroll statically (one XLA fusion)
_STATIC_TAP_LIMIT = 20


def _lerp_shift_axis(vol: jnp.ndarray, offset: jnp.ndarray, axis: int, max_disp: int):
    """1-D linear interpolation along ``axis`` at per-voxel offsets (voxels).

    Offsets saturate at the displacement bound ASYMMETRICALLY — clipped to
    [-max_disp, max_disp - 1] — so the positive side samples up to one voxel
    short at saturation.  The select-chain needs one comparison per integer
    offset; covering +max_disp exactly would add a tap (~5% more VPU work in
    the demons warp) to change values only where the field has already
    exceeded the caller-chosen bound, i.e. where it is truncated regardless.
    Callers sizing halos may rely on |sample reach| <= max_disp.
    Returns (values, inside_mask)."""
    n = vol.shape[axis]
    base = jax.lax.broadcasted_iota(jnp.float32, offset.shape, axis)
    u_raw = base + offset
    inside = (u_raw >= -0.5) & (u_raw <= n - 0.5)
    off = jnp.clip(offset, -max_disp, max_disp - 1)
    u = jnp.clip(base + off, 0.0, n - 1.0)
    x0 = jnp.floor(u)
    t = (u - x0).astype(vol.dtype)
    d = (x0 - base).astype(jnp.int32)
    pad_width = [(0, 0)] * vol.ndim
    pad_width[axis] = (max_disp, max_disp + 1)
    p = jnp.pad(vol, pad_width, mode="edge")

    n_taps = 2 * max_disp + 2
    if n_taps <= _STATIC_TAP_LIMIT:
        # static slices: XLA fuses all taps into ONE loop fusion — the
        # accumulator never round-trips HBM (a fori_loop accumulator does,
        # tripling the traffic of the demons warp).  Select-chain form: d is
        # clipped to [-max_disp, max_disp-1], so chain one select per integer
        # offset over the lerp of adjacent taps — 1 cmp + 1 select + 1 fma
        # per tap vs the 2-cmp/2-select/1-add weight form (~40% fewer VPU ops
        # in the demons hot warp), and 2 fewer taps.
        acc = jnp.zeros(offset.shape, vol.dtype)
        sh_prev = jax.lax.slice_in_dim(p, 0, n, axis=axis)
        for k in range(2 * max_disp):
            sh_next = jax.lax.slice_in_dim(p, k + 1, k + 1 + n, axis=axis)
            lerp = sh_prev + t * (sh_next - sh_prev)
            acc = acc + jnp.where(d == k - max_disp, lerp, 0.0)
            sh_prev = sh_next
        return acc, inside

    # large-displacement fallback: sequential accumulation keeps the live set
    # O(volume) (full unrolling at ~34 taps made XLA hold the temporaries and
    # OOM at batch scale); a small unroll per fori step recovers overlap
    unroll = 2
    n_steps = (n_taps + unroll - 1) // unroll

    def body(step, acc):
        for j in range(unroll):
            k = step * unroll + j
            sh = jax.lax.dynamic_slice_in_dim(p, k, n, axis)
            kk = k - max_disp
            w = jnp.where(d == kk, 1.0 - t, 0.0) + jnp.where(d + 1 == kk, t, 0.0)
            acc = acc + w * sh
        return acc

    out = jax.lax.fori_loop(0, n_steps, body, jnp.zeros(offset.shape, vol.dtype))
    # taps beyond n_taps (when unroll doesn't divide) contribute zero weight
    # only if k stays within the padded range; guard by construction:
    # pad already covers k in [0, n_steps*unroll) because d is clipped
    return out, inside


def warp_multipass(
    vol: jnp.ndarray,
    off_x: jnp.ndarray,
    off_y: jnp.ndarray,
    off_z: jnp.ndarray,
    max_disp_vox=(16, 16, 16),
    default_value: float = 0.0,
):
    """Warp a [z,y,x] volume by per-voxel index offsets via three 1-D passes.

    ``max_disp_vox`` is the static per-axis (x,y,z) displacement bound in
    voxels; offsets saturate to [-bound, bound - 1] per axis (see
    ``_lerp_shift_axis``).  Out-of-domain voxels get ``default_value``.
    """
    dx, dy, dz = (int(v) for v in max_disp_vox)
    out, in_x = _lerp_shift_axis(vol, off_x, 2, dx)
    out, in_y = _lerp_shift_axis(out, off_y, 1, dy)
    out, in_z = _lerp_shift_axis(out, off_z, 0, dz)
    inside = in_x & in_y & in_z
    return jnp.where(inside, out, jnp.asarray(default_value, out.dtype))


# ---------------------------------------------------------------------------
# separable (axis-aligned) resampling as per-axis matmuls — rides the MXU
# ---------------------------------------------------------------------------

def axis_interp_matrix(n_in: int, n_out: int, scale: float, shift: float,
                       interp=INTERP_LINEAR):
    """Interpolation matrix W [n_out, n_in] for u = scale*i_out + shift, plus
    the per-output validity vector (ITK [-0.5, n-0.5] buffer bounds)."""
    i_out = np.arange(n_out, dtype=np.float64)
    u = scale * i_out + shift
    valid = (u >= -0.5) & (u <= n_in - 0.5)
    w = np.zeros((n_out, n_in), dtype=np.float32)
    interp = interp_name(interp)
    if interp == INTERP_NEAREST:
        idx = np.clip(np.round(u).astype(int), 0, n_in - 1)
        w[np.arange(n_out), idx] = 1.0
    elif interp == INTERP_LINEAR:
        x0 = np.floor(u)
        t = u - x0
        i0 = np.clip(x0.astype(int), 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        np.add.at(w, (np.arange(n_out), i0), (1.0 - t).astype(np.float32))
        np.add.at(w, (np.arange(n_out), i1), t.astype(np.float32))
    elif interp == INTERP_BSPLINE:
        x0 = np.floor(u)
        t = u - x0
        t2, t3 = t * t, t * t * t
        weights = [
            (1 - 3 * t + 3 * t2 - t3) / 6.0,
            (4 - 6 * t2 + 3 * t3) / 6.0,
            (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0,
            t3 / 6.0,
        ]
        for k, wk in enumerate(weights):
            ik = np.clip(x0.astype(int) + k - 1, 0, n_in - 1)
            np.add.at(w, (np.arange(n_out), ik), wk.astype(np.float32))
    else:  # pragma: no cover
        raise ValueError(interp)
    return w, valid


def resample_separable(
    array: jnp.ndarray,
    axis_maps,  # ((scale_x, shift_x), (scale_y, shift_y), (scale_z, shift_z))
    out_shape_zyx,
    interp=INTERP_LINEAR,
    default_value: float = 0.0,
):
    """Exact axis-aligned resampling as three per-axis matmuls (MXU-bound).

    For B-spline, pass prefiltered coefficients as ``array``.
    """
    nz_i, ny_i, nx_i = array.shape[:3]
    nz_o, ny_o, nx_o = out_shape_zyx
    (sx, bx), (sy, by), (sz, bz) = axis_maps
    wx, vx = axis_interp_matrix(nx_i, nx_o, sx, bx, interp)
    wy, vy = axis_interp_matrix(ny_i, ny_o, sy, by, interp)
    wz, vz = axis_interp_matrix(nz_i, nz_o, sz, bz, interp)
    return _resample_separable_jit(
        array,
        wx_key=_np_key(wx), wy_key=_np_key(wy), wz_key=_np_key(wz),
        valid_key=(tuple(bool(v) for v in vx), tuple(bool(v) for v in vy),
                   tuple(bool(v) for v in vz)),
        default_value=float(default_value),
    )


def _np_key(arr: np.ndarray):
    return (arr.shape, arr.tobytes())


@functools.partial(
    jax.jit, static_argnames=("wx_key", "wy_key", "wz_key", "valid_key", "default_value")
)
def _resample_separable_jit(array, *, wx_key, wy_key, wz_key, valid_key, default_value):
    def unkey(key):
        shape, buf = key
        return jnp.asarray(np.frombuffer(buf, dtype=np.float32).reshape(shape))

    wx, wy, wz = unkey(wx_key), unkey(wy_key), unkey(wz_key)
    vx = np.asarray(valid_key[0])
    vy = np.asarray(valid_key[1])
    vz = np.asarray(valid_key[2])

    arr = array.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    if arr.ndim == 3:
        out = jnp.einsum("zyx,Xx->zyX", arr, wx, precision=hp)
        out = jnp.einsum("zyx,Yy->zYx", out, wy, precision=hp)
        out = jnp.einsum("zyx,Zz->Zyx", out, wz, precision=hp)
    else:
        out = jnp.einsum("zyxc,Xx->zyXc", arr, wx, precision=hp)
        out = jnp.einsum("zyxc,Yy->zYxc", out, wy, precision=hp)
        out = jnp.einsum("zyxc,Zz->Zyxc", out, wz, precision=hp)

    valid = (
        jnp.asarray(vz)[:, None, None]
        & jnp.asarray(vy)[None, :, None]
        & jnp.asarray(vx)[None, None, :]
    )
    if arr.ndim == 4:
        valid = valid[..., None]
    return jnp.where(valid, out, jnp.asarray(default_value, out.dtype))


# ---------------------------------------------------------------------------
# shear-factorised affine resampling (gather-free)
# ---------------------------------------------------------------------------
#
# An affine index->index map factors into three elementary "row" maps
# M = S_x · S_y · S_z (homogeneous 4x4; S_i modifies only coordinate i).
# Applying three 1-D per-voxel interpolation passes (x, then y, then z) with
# the factored offsets reproduces the affine's coordinates EXACTLY; each pass
# is a shift-and-select sweep (VPU-bound), so no XLA gather is needed.  The
# interpolation is separable (shear-warp) rather than direct trilinear — ideal
# for registration losses; final resamples keep the exact gather path.

def _shear_factors(m_h: jnp.ndarray):
    """Factor homogeneous M into row maps r_x, r_y, r_z (each length 4).

    S_z has row z = r_z; S_y row y = r_y; S_x row x = r_x;
    M = S_x @ S_y @ S_z.
    """
    hp = jax.lax.Precision.HIGHEST
    eye = jnp.eye(4, dtype=m_h.dtype)
    r_z = m_h[2, :]
    s_z = eye.at[2, :].set(r_z)
    s_z_inv = jnp.linalg.inv(s_z)
    r_y = jnp.matmul(m_h[1, :], s_z_inv, precision=hp)
    s_y = eye.at[1, :].set(r_y)
    s_yz_inv = jnp.linalg.inv(jnp.matmul(s_y, s_z, precision=hp))
    r_x = jnp.matmul(m_h[0, :], s_yz_inv, precision=hp)
    return r_x, r_y, r_z


def _lerp_map_axis_mm(vol: jnp.ndarray, u: jnp.ndarray, axis: int):
    """1-D linear interp along ``axis`` at absolute coordinates ``u`` (the
    output length along that axis is ``u``'s — it may differ from the
    input's) as a banded-weight MXU contraction: 2-3 ops per shear pass.

    Returns (values, inside_mask).  ``u`` has the OUTPUT shape."""
    in_n = vol.shape[axis]
    v = jnp.moveaxis(vol, axis, -1)
    u_m = jnp.moveaxis(u, axis, -1)
    inside = (u_m >= -0.5) & (u_m <= in_n - 0.5)
    uc = jnp.clip(u_m, 0.0, in_n - 1.0)
    j = jnp.arange(in_n, dtype=uc.dtype)
    # Floor-based tent weights, NOT clip(1-|uc-j|): the |.| form has zero
    # derivative at integer coordinates (d|x|/dx = 0 at 0), which starves the
    # registration optimiser of gradient when the initial transform lands on
    # the grid.  This form's derivative is v[x0+1]-v[x0] everywhere — the
    # exact lerp derivative.
    x0 = jax.lax.stop_gradient(jnp.floor(uc))[..., :, None]
    t = uc[..., :, None] - x0
    w = jnp.where(j == x0, 1.0 - t, 0.0) + jnp.where(j == x0 + 1.0, t, 0.0)
    out = jnp.einsum("...kj,...j->...k", w, v, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis), jnp.moveaxis(inside, -1, axis)


# W tensors beyond this many elements are built slab-by-slab (lax.map) so the
# banded weights never materialise whole; beyond ~full-axis shifts the
# shift-select sweep would need 2n taps and is never competitive
_SHEAR_MM_BUDGET = 48 * 1024 * 1024


def _lerp_map_axis_mm_chunked(vol: jnp.ndarray, u: jnp.ndarray, axis: int,
                              n_chunks: int):
    """Chunked variant of _lerp_map_axis_mm: slabs along the leading non-op
    axis keep the per-slab banded weight tensor under the budget."""
    lead = 0 if axis != 0 else 1
    n_lead = vol.shape[lead]
    chunk = -(-n_lead // n_chunks)
    pad_n = chunk * n_chunks - n_lead

    def pad_lead(a):
        pw = [(0, 0)] * a.ndim
        pw[lead] = (0, pad_n)
        return jnp.pad(a, pw) if pad_n else a

    v = jnp.moveaxis(pad_lead(vol), lead, 0)
    uu = jnp.moveaxis(pad_lead(u), lead, 0)
    # op-axis position in the slab: unchanged when lead==0; z lands at 1 when
    # the lead (y) axis moved to the front
    op_v = axis if lead == 0 else 1
    v = v.reshape((n_chunks, chunk) + v.shape[1:])
    uu = uu.reshape((n_chunks, chunk) + uu.shape[1:])

    def one(args):
        vs, us = args
        return _lerp_map_axis_mm(vs, us, op_v)

    out, inside = jax.lax.map(one, (v, uu))
    out = out.reshape((n_chunks * chunk,) + out.shape[2:])
    inside = inside.reshape((n_chunks * chunk,) + inside.shape[2:])
    out = jnp.moveaxis(out, 0, lead)
    inside = jnp.moveaxis(inside, 0, lead)
    if pad_n:
        sl = [slice(None)] * out.ndim
        sl[lead] = slice(0, n_lead)
        out, inside = out[tuple(sl)], inside[tuple(sl)]
    return out, inside


def affine_shear_resample(
    vol: jnp.ndarray,
    m_h: jnp.ndarray,
    out_shape_zyx,
    default_value: float = 0.0,
):
    """Resample [z,y,x] through an index->index homogeneous affine ``m_h``
    (output index -> input index) using three gather-free shear passes."""
    nz_o, ny_o, nx_o = (int(v) for v in out_shape_zyx)
    nz_i, ny_i, nx_i = vol.shape
    r_x, r_y, r_z = _shear_factors(m_h.astype(jnp.float32))

    def coords(shape):
        ix = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
        iy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
        iz = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        return ix, iy, iz

    def do_pass(v, u, axis, out_len, in_n):
        w_elems = int(np.prod(v.shape)) * out_len
        if w_elems <= _SHEAR_MM_BUDGET:
            return _lerp_map_axis_mm(v, u, axis)
        n_chunks = -(-w_elems // _SHEAR_MM_BUDGET)
        lead = 0 if axis != 0 else 1
        n_chunks = min(n_chunks, v.shape[lead])
        return _lerp_map_axis_mm_chunked(v, u, axis, n_chunks)

    # pass 1 (x): intermediate grid (nz_i, ny_i, nx_o)
    shape1 = (nz_i, ny_i, nx_o)
    ix, iy, iz = coords(shape1)
    u_x = r_x[0] * ix + r_x[1] * iy + r_x[2] * iz + r_x[3]
    out, in_x = do_pass(vol, u_x, 2, nx_o, nx_i)

    # pass 2 (y): grid (nz_i, ny_o, nx_o)
    shape2 = (nz_i, ny_o, nx_o)
    ix, iy, iz = coords(shape2)
    u_y = r_y[0] * ix + r_y[1] * iy + r_y[2] * iz + r_y[3]
    out, in_y = do_pass(out, u_y, 1, ny_o, ny_i)
    in_x, _ = do_pass(in_x.astype(jnp.float32), u_y, 1, ny_o, ny_i)

    # pass 3 (z): grid (nz_o, ny_o, nx_o)
    shape3 = (nz_o, ny_o, nx_o)
    ix, iy, iz = coords(shape3)
    u_z = r_z[0] * ix + r_z[1] * iy + r_z[2] * iz + r_z[3]
    out, in_z = do_pass(out, u_z, 0, nz_o, nz_i)
    in_x, _ = do_pass(in_x, u_z, 0, nz_o, nz_i)
    in_y, _ = do_pass(in_y.astype(jnp.float32), u_z, 0, nz_o, nz_i)

    inside = (in_x > 0.999) & (in_y > 0.999) & in_z
    return jnp.where(inside, out, jnp.asarray(default_value, out.dtype)), inside
