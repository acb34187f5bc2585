"""Pallas TPU kernels for the bandwidth-critical 1-D passes.

The demons inner loop is HBM-bound: the multipass warp evaluates
``2*max_disp+2`` shifted taps per axis and the per-iteration Gaussian
smoothings another ~7 per axis.  Expressed in XLA each tap re-reads the
volume from HBM; expressed as a Pallas kernel the block (with its full op
axis resident in VMEM) is read ONCE and all taps are VPU register/VMEM
traffic.  That takes a pass from ~(n_taps+1) volume-reads to ~2.

STATUS — benchmarked, NOT wired into the pipelines: on v5e these
element-indexed overlapping-slab kernels measured ~3x SLOWER than the
banded-matmul formulation that ships in core/filters.py (the [z,y,x,3]
field's lane dim also forces a padded T(8,128) layout at the pallas
boundary).  They are kept, with tests, as the reference implementation for
revisiting on hardware where the trade flips (larger VMEM, narrower MXU);
wire them via ``_conv1d_along_axis`` if that happens.  On CPU (tests) they
run under ``interpret=True`` for bit-accurate parity with the TPU path.

Roofline accounting for why the banded-matmul path stands (v5e, measured
2026-08): the demons smooth+add+smooth at 30x128x160x160 f32 moves ~13
volume-traffics sequentially and measures 11.8 ms = ~435 GB/s achieved —
the same bandwidth a pure fori_loop streaming saxpy achieves on this part
(~460 GB/s), i.e. the sequential path already runs at the machine's
effective stream rate.  A fused slab kernel's theoretical 2.6-traffic
minimum is eaten by (a) the XLA edge-replicate pre-pads it needs
(~2 extra traffics per operand) and (b) z-halo re-reads: the combined
G_upd∘G_std halo is ~18 planes while VMEM (16 MB) caps slabs of
160x160 f32 rows at ~150 planes total across in/out/temp buffers, forcing
zt≈16 and a 2.1x read amplification.  Net fused traffic ≈ 9V vs 13V —
a ~25% bound that does not survive kernel overheads.  Revisit when VMEM
grows or volumes shrink below ~96x128x128 (halo fits, amplification ~1.3x).

Mirrors (functionally): ITK's ``WarpImageFilter`` taps inside
FastSymmetricForcesDemonsRegistrationFilter (reference deformable.py:244) and
``SmoothingRecursiveGaussian``/``DiscreteGaussian`` (deformable.py:158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

__all__ = ["lerp_shift_axis_pallas", "conv_axis_pallas", "pallas_available"]


def pallas_available() -> bool:
    """True when the Pallas TPU path should be used (real TPU backend)."""
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _params_for(grid_len: int):
    if not _HAS_PLTPU:
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",) * grid_len,
        vmem_limit_bytes=100 * 1024 * 1024,
    )


# ---------------------------------------------------------------------------
# per-voxel 1-D linear interpolation (the demons warp pass)
# ---------------------------------------------------------------------------

def _lerp_kernel(p_ref, off_ref, out_ref, *, n: int, maxd: int, axis: int):
    off = off_ref[...]
    # mosaic iota must be integer-typed
    base = jax.lax.broadcasted_iota(jnp.int32, off.shape, axis).astype(jnp.float32)
    offc = jnp.clip(off, -float(maxd), float(maxd) - 1.0)
    u = jnp.clip(base + offc, 0.0, float(n) - 1.0)
    x0 = jnp.floor(u)
    t = u - x0
    d = (x0 - base).astype(jnp.int32)
    acc = jnp.zeros(off.shape, jnp.float32)
    for k in range(2 * maxd + 2):
        if axis == 0:
            sh = p_ref[k : k + n, :, :]
        elif axis == 1:
            sh = p_ref[:, k : k + n, :]
        else:
            sh = p_ref[:, :, k : k + n]
        kk = k - maxd
        w = jnp.where(d == kk, 1.0 - t, 0.0) + jnp.where(d + 1 == kk, t, 0.0)
        acc = acc + w * sh
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("axis", "max_disp", "interpret"))
def lerp_shift_axis_pallas(vol, offset, axis: int, max_disp: int,
                           interpret: bool = False):
    """1-D linear interpolation of ``vol`` along ``axis`` at per-voxel offsets
    (|offset| clamped to ``max_disp``), full op axis resident in VMEM.

    Returns interpolated values only (the caller computes the inside mask from
    the raw offsets — it fuses into surrounding elementwise work).
    """
    nz, ny, nx = vol.shape
    n = vol.shape[axis]
    maxd = int(max_disp)
    pad = [(0, 0)] * 3
    pad[axis] = (maxd, maxd + 1)
    p = jnp.pad(vol.astype(jnp.float32), pad, mode="edge")
    offset = offset.astype(jnp.float32)

    kernel = functools.partial(_lerp_kernel, n=n, maxd=maxd, axis=axis)
    n_pad = n + 2 * maxd + 1

    if axis == 0:
        by, bx = min(8, ny), min(128, nx)
        grid = (_ceil_div(ny, by), _ceil_div(nx, bx))
        p_spec = pl.BlockSpec((n_pad, by, bx), lambda i, j: (0, i, j))
        o_spec = pl.BlockSpec((n, by, bx), lambda i, j: (0, i, j))
    elif axis == 1:
        bz, bx = min(8, nz), min(128, nx)
        grid = (_ceil_div(nz, bz), _ceil_div(nx, bx))
        p_spec = pl.BlockSpec((bz, n_pad, bx), lambda i, j: (i, 0, j))
        o_spec = pl.BlockSpec((bz, n, bx), lambda i, j: (i, 0, j))
    else:
        bz, by = min(8, nz), min(8, ny)
        grid = (_ceil_div(nz, bz), _ceil_div(ny, by))
        p_spec = pl.BlockSpec((bz, by, n_pad), lambda i, j: (i, j, 0))
        o_spec = pl.BlockSpec((bz, by, n), lambda i, j: (i, j, 0))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        grid=grid,
        in_specs=[p_spec, o_spec],
        out_specs=o_spec,
        compiler_params=None if interpret else _params_for(len(grid)),
        interpret=interpret,
    )(p, offset)


# ---------------------------------------------------------------------------
# constant-kernel 1-D convolution (Gaussian smoothing pass)
# ---------------------------------------------------------------------------

def _conv_kernel(p_ref, out_ref, *, n: int, taps, axis: int):
    acc = None
    for k, w in enumerate(taps):
        if axis == 0:
            sh = p_ref[k : k + n, :, :]
        elif axis == 1:
            sh = p_ref[:, k : k + n, :]
        else:
            sh = p_ref[:, :, k : k + n]
        acc = w * sh if acc is None else acc + w * sh
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("taps", "axis", "interpret"))
def conv_axis_pallas(vol, taps, axis: int, interpret: bool = False):
    """Correlate ``vol`` with static 1-D ``taps`` along ``axis``
    (edge-replicate padding, matching ``filters._conv1d`` semantics), taps
    resident in VMEM.

    ``vol`` may be [z,y,x] or [z,y,x,c] (channels fold into the lane dim of a
    reshaped view only when axis != last; callers pass 3-D slices otherwise).
    """
    taps = tuple(float(t) for t in taps)
    r = (len(taps) - 1) // 2
    nz, ny, nx = vol.shape[:3]
    n = vol.shape[axis]
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (r, len(taps) - 1 - r)
    p = jnp.pad(vol.astype(jnp.float32), pad, mode="edge")

    squeeze = False
    if vol.ndim == 3:
        squeeze = True
        p = p[..., None]
    nc = p.shape[-1]

    # fold channels into x (lane) when convolving z/y; keep separate when x
    kernel = functools.partial(_conv_kernel, n=n, taps=taps, axis=axis)
    n_pad = n + len(taps) - 1

    if axis == 0:
        p2 = p.reshape(p.shape[0], ny, nx * nc)
        by, bx = min(8, ny), min(128, nx * nc)
        grid = (_ceil_div(ny, by), _ceil_div(nx * nc, bx))
        p_spec = pl.BlockSpec((n_pad, by, bx), lambda i, j: (0, i, j))
        o_spec = pl.BlockSpec((n, by, bx), lambda i, j: (0, i, j))
        out_shape = (nz, ny, nx * nc)
    elif axis == 1:
        p2 = p.reshape(nz, p.shape[1], nx * nc)
        bz, bx = min(8, nz), min(128, nx * nc)
        grid = (_ceil_div(nz, bz), _ceil_div(nx * nc, bx))
        p_spec = pl.BlockSpec((bz, n_pad, bx), lambda i, j: (i, 0, j))
        o_spec = pl.BlockSpec((bz, n, bx), lambda i, j: (i, 0, j))
        out_shape = (nz, ny, nx * nc)
    else:
        # x axis: channels cannot fold into lanes (stride); treat channel as
        # leading dim by moving it next to z
        p2 = jnp.moveaxis(p, -1, 0).reshape(nc * nz, ny, p.shape[2])
        bz, by = min(8, nc * nz), min(8, ny)
        grid = (_ceil_div(nc * nz, bz), _ceil_div(ny, by))
        p_spec = pl.BlockSpec((bz, by, n_pad), lambda i, j: (i, j, 0))
        o_spec = pl.BlockSpec((bz, by, n), lambda i, j: (i, j, 0))
        out_shape = (nc * nz, ny, nx)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=grid,
        in_specs=[p_spec],
        out_specs=o_spec,
        compiler_params=None if interpret else _params_for(len(grid)),
        interpret=interpret,
    )(p2)

    if axis == 2:
        out = out.reshape(nc, nz, ny, nx)
        out = jnp.moveaxis(out, 0, -1)
    else:
        out = out.reshape(nz, ny, nx, nc)
    if squeeze:
        out = out[..., 0]
    return out

# ---------------------------------------------------------------------------
# fused separable 3-D Gaussian smoothing (one HBM round trip)
# ---------------------------------------------------------------------------

def _gauss3d_kernel(p_ref, out_ref, *, taps_zyx, zt: int, yt: int, nx: int):
    tz, ty, tx = taps_zyx
    v = p_ref[0]  # (zt + len(tz)-1, yt + len(ty)-1, nx + len(tx)-1)
    acc = None
    for k, w in enumerate(tx):
        sh = v[:, :, k : k + nx]
        acc = w * sh if acc is None else acc + w * sh
    v = acc
    acc = None
    for k, w in enumerate(ty):
        sh = v[:, k : k + yt, :]
        acc = w * sh if acc is None else acc + w * sh
    v = acc
    acc = None
    for k, w in enumerate(tz):
        sh = v[k : k + zt, :, :]
        acc = w * sh if acc is None else acc + w * sh
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("taps_zyx", "z_tile", "interpret"))
def gauss3d_pallas(vol, taps_zyx, z_tile: int = 8, interpret: bool = False):
    """Fused separable 3-D convolution (x -> y -> z passes) in ONE kernel:
    each z-slab stays in VMEM across all three passes, so the whole smooth
    costs ~2.5 HBM volume-traffics instead of ~6 (2 per sequential pass).

    ``vol``: [z,y,x] or [z,y,x,c]; ``taps_zyx``: three static tap tuples
    (z, y, x axis order).  Edge-replicate padding (ITK boundary semantics).
    Overlapping slab reads use ``pl.Element`` z indexing.
    """
    taps_zyx = tuple(tuple(float(v) for v in t) for t in taps_zyx)
    tz, ty, tx = taps_zyx
    # mosaic requires the sublane (y) block dim be 8-divisible: zero-extend
    # the y taps until the halo is a multiple of 8 (zero taps are free FMAs)
    while (len(ty) - 1) % 8:
        ty = (0.0,) + ty + (0.0,)
    taps_zyx = (tz, ty, tx)
    hz, hy, hx = len(tz) - 1, len(ty) - 1, len(tx) - 1
    rz, ry, rx = hz // 2, hy // 2, hx // 2

    squeeze = vol.ndim == 3
    v4 = vol[..., None] if squeeze else vol
    nz, ny, nx, nc = v4.shape
    v = jnp.moveaxis(v4.astype(jnp.float32), -1, 0)  # (c, z, y, x)

    zt = min(z_tile, nz)
    n_slab = _ceil_div(nz, zt)
    nz_round = n_slab * zt
    yt = min(32, ny)
    n_yslab = _ceil_div(ny, yt)
    ny_round = n_yslab * yt
    # pad: z/y to slab multiples plus halo, x by halo; edge-replicate
    p = jnp.pad(
        v,
        ((0, 0), (rz, hz - rz + (nz_round - nz)),
         (ry, hy - ry + (ny_round - ny)), (rx, hx - rx)),
        mode="edge",
    )

    kernel = functools.partial(_gauss3d_kernel, taps_zyx=taps_zyx, zt=zt, yt=yt, nx=nx)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nc, nz_round, ny_round, nx), jnp.float32),
        grid=(nc, n_slab, n_yslab),
        in_specs=[
            # mosaic requires all-or-none Element dims
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(zt + hz),
                    pl.Element(yt + hy),
                    pl.Element(nx + hx),
                ),
                lambda c, j, i: (c, j * zt, i * yt, 0),
            )
        ],
        out_specs=pl.BlockSpec((1, zt, yt, nx), lambda c, j, i: (c, j, i, 0)),
        compiler_params=None if interpret else _params_for(3),
        interpret=interpret,
    )(p)
    out = out[:, :nz, :ny]
    out = jnp.moveaxis(out, 0, -1)
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# fused demons regularisation: field' = G_std( field + G_upd(update) )
# ---------------------------------------------------------------------------

def _smooth_add_kernel(u_ref, f_ref, out_ref, *, taps_upd, taps_std,
                       zt: int, yt: int, nx: int):
    """u block has halo h1+h2 per axis; f block halo h2; out (zt,yt,nx)."""

    def conv3(v, taps, nz_o, ny_o, nx_o):
        tz, ty, tx = taps
        acc = None
        for k, w in enumerate(tx):
            if w == 0.0:
                continue
            sh = v[:, :, k : k + nx_o]
            acc = w * sh if acc is None else acc + w * sh
        v = acc
        acc = None
        for k, w in enumerate(ty):
            if w == 0.0:
                continue
            sh = v[:, k : k + ny_o, :]
            acc = w * sh if acc is None else acc + w * sh
        v = acc
        acc = None
        for k, w in enumerate(tz):
            if w == 0.0:
                continue
            sh = v[k : k + nz_o, :, :]
            acc = w * sh if acc is None else acc + w * sh
        return acc

    h2z = len(taps_std[0]) - 1
    h2y = len(taps_std[1]) - 1
    h2x = len(taps_std[2]) - 1
    # G_upd(update) on the std-halo-extended region
    u_sm = conv3(u_ref[0], taps_upd, zt + h2z, yt + h2y, nx + h2x)
    v = f_ref[0] + u_sm
    out_ref[0] = conv3(v, taps_std, zt, yt, nx)


def _align8(taps):
    taps = tuple(float(v) for v in taps)
    while (len(taps) - 1) % 8:
        taps = (0.0,) + taps + (0.0,)
    return taps


@functools.partial(
    jax.jit, static_argnames=("taps_upd_zyx", "taps_std_zyx", "z_tile", "interpret")
)
def smooth_add_smooth_pallas(update, field, taps_upd_zyx, taps_std_zyx,
                             z_tile: int = 16, interpret: bool = False):
    """One fused kernel for the demons regularisation step:
    ``G_std(field + G_upd(update))`` — both Gaussians and the add happen on
    VMEM-resident slabs, one HBM round trip instead of ~13 (2 fields x 2
    smooths x 3 passes + add).

    ``update``/``field``: [z,y,x,3] (or [z,y,x]).  Edge-replicate padding per
    smooth, matching the sequential formulation exactly.
    """
    taps_upd = tuple(tuple(float(v) for v in t) for t in taps_upd_zyx)
    taps_std = tuple(tuple(float(v) for v in t) for t in taps_std_zyx)
    # y halos must each be 8-divisible (sublane blocks)
    taps_upd = (taps_upd[0], _align8(taps_upd[1]), taps_upd[2])
    taps_std = (taps_std[0], _align8(taps_std[1]), taps_std[2])
    h1 = tuple(len(t) - 1 for t in taps_upd)
    h2 = tuple(len(t) - 1 for t in taps_std)
    r1 = tuple(h // 2 for h in h1)
    r2 = tuple(h // 2 for h in h2)

    squeeze = update.ndim == 3
    u4 = update[..., None] if squeeze else update
    f4 = field[..., None] if squeeze else field
    nz, ny, nx, nc = u4.shape
    u = jnp.moveaxis(u4.astype(jnp.float32), -1, 0)
    f = jnp.moveaxis(f4.astype(jnp.float32), -1, 0)

    zt = min(z_tile, nz)
    n_zs = _ceil_div(nz, zt)
    nz_round = n_zs * zt
    yt = min(32, ny)
    if yt < ny:
        yt = 32
    n_ys = _ceil_div(ny, yt)
    ny_round = n_ys * yt

    def padded(v, r, h):
        return jnp.pad(
            v,
            ((0, 0), (r[0], h[0] - r[0] + (nz_round - nz)),
             (r[1], h[1] - r[1] + (ny_round - ny)), (r[2], h[2] - r[2])),
            mode="edge",
        )

    # update needs both halos; field only the outer (std) halo
    hu = tuple(a + b for a, b in zip(h1, h2))
    ru = tuple(a + b for a, b in zip(r1, r2))
    up = padded(u, ru, hu)
    fp = padded(f, r2, h2)

    kernel = functools.partial(
        _smooth_add_kernel, taps_upd=taps_upd, taps_std=taps_std,
        zt=zt, yt=yt, nx=nx,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nc, nz_round, ny_round, nx), jnp.float32),
        grid=(nc, n_zs, n_ys),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(zt + hu[0]),
                 pl.Element(yt + hu[1]), pl.Element(nx + hu[2])),
                lambda c, j, i: (c, j * zt, i * yt, 0),
            ),
            pl.BlockSpec(
                (pl.Element(1), pl.Element(zt + h2[0]),
                 pl.Element(yt + h2[1]), pl.Element(nx + h2[2])),
                lambda c, j, i: (c, j * zt, i * yt, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, zt, yt, nx), lambda c, j, i: (c, j, i, 0)),
        compiler_params=None if interpret else _params_for(3),
        interpret=interpret,
    )(up, fp)
    out = out[:, :nz, :ny]
    out = jnp.moveaxis(out, 0, -1)
    return out[..., 0] if squeeze else out
