"""Atlas-parallel execution — the framework's data parallelism.

The reference runs its N independent per-atlas registrations serially
(multiatlas/run.py:261-347, cardiac/run.py:674-869) — the dominant outer loop.
Here the atlases are STACKED on a leading axis and the whole chain

    pyramid -> demons (all levels) -> structure warp -> weight map -> fusion

is one jit-compiled program vmapped over that axis.  On a multi-chip mesh the
stacks are sharded over an ``atlas`` axis (``NamedSharding`` + GSPMD), so each
chip runs its atlases' registrations locally and the fusion sum becomes a
``psum``-style collective on ICI.  This is the key to the <60 s north star.

All functions here are pure-array (metadata passed statically) so they
vmap/shard/jit cleanly; the Image-level pipeline wraps them.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core import filters as _filters
from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST
from platipy_tpu.registration.deformable import _demons_level_impl

# storage dtype of the demons field/update chain in the BATCHED atlas path
# (the public/serial demons stays f32 for exact reproducibility); flipped by
# the bench A/B — see registration/deformable._demons_level_impl
DEMONS_FIELD_DTYPE = "float32"

__all__ = [
    "atlas_mesh",
    "shard_over_atlases",
    "batched_multiscale_demons",
    "batched_warp_by_dvf",
    "batched_warp_stacks_by_dvf",
    "batched_weight_maps",
    "extract_packed_bit",
    "level_grids",
    "pack_binary_masks",
    "unpack_binary_masks",
]


# ---------------------------------------------------------------------------
# mesh helpers
# ---------------------------------------------------------------------------

@jax.jit
def combine_for_crop(arrays):
    """Mean of the quick-registered atlas volumes thresholded at air, as ONE
    device program — fetching each registered volume to host for the combine
    costs ~0.3 s per volume over a remote-device link (shared by the
    multiatlas and cardiac auto-crop stages).  Accepts a list of [z,y,x]
    volumes or one already-stacked [N,z,y,x] array."""
    if isinstance(arrays, (list, tuple)):
        stack = jnp.stack([a.astype(jnp.float32) for a in arrays])
    else:
        stack = arrays.astype(jnp.float32)
    return (jnp.mean(stack, axis=0) > -1000).astype(jnp.uint8)


def sharding_enabled() -> bool:
    """Whether the heavy pipelines should shard the atlas axis over devices.

    True on real accelerator platforms (TPU — the deployment target — or
    anything that is not the host CPU backend).  On the CPU backend the
    "devices" are host threads (--xla_force_host_platform_device_count) and
    XLA's in-process collectives can cross-match rendezvous participants when
    several heavy sharded programs are in flight on an oversubscribed core —
    observed as an AwaitAndLogIfStuck SIGABRT / futex deadlock in CI.  Small
    single-program shard tests (tests/test_spatial.py, __graft_entry__'s
    dryrun) stay safe and keep the multi-chip path covered; set
    ``PLATIPY_TPU_SHARD_ON_CPU=1`` to force pipeline sharding on CPU.
    """
    import os

    if os.environ.get("PLATIPY_TPU_SHARD_ON_CPU") == "1":
        return True
    return jax.default_backend() != "cpu"


def atlas_mesh(n_devices: Optional[int] = None):
    """1-D device mesh over an 'atlas' axis (data parallelism over atlases)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.array(devices), ("atlas",))


def shard_over_atlases(stack: jnp.ndarray, mesh) -> jnp.ndarray:
    """Shard a [N, ...] stack over the mesh's atlas axis (pads N if needed is
    the caller's job; N must be divisible by the axis size)."""
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("atlas")
    )
    return jax.device_put(stack, sharding)


def pad_atlas_axis(stack: jnp.ndarray, n_devices: int):
    """Pad a [N, ...] stack along the atlas axis to a multiple of the device
    count by repeating the last atlas.  Returns (padded_stack, n_valid).

    Atlas lanes are independent through registration, so padded lanes are
    harmless wasted work; fusion must zero their weights (multiply the weight
    stack by ``atlas_validity_mask``).  Wall-clock argument: 10 atlases on 8
    chips unsharded leave 7 chips idle; padded to 16, each chip runs 2 lanes
    — ~5x faster despite 6 wasted lanes."""
    n = stack.shape[0]
    pad = (-n) % n_devices
    if pad == 0:
        return stack, n
    return jnp.concatenate([stack, jnp.repeat(stack[-1:], pad, axis=0)]), n


def atlas_validity_mask(n_valid: int, n_total: int) -> jnp.ndarray:
    """[n_total] float mask: 1 for real atlases, 0 for padded lanes."""
    return (jnp.arange(n_total) < n_valid).astype(jnp.float32)


# ---------------------------------------------------------------------------
# grid utilities (same origin/direction, spacing/shape change only)
# ---------------------------------------------------------------------------

def level_grids(shape_zyx, spacing_xyz, resolution_staging, isotropic_resample):
    """Pyramid level (shape, spacing) pairs with the reference's exact
    smooth_and_resample size/spacing formulas (registration/utils.py:237-255)."""
    out = []
    size_xyz = np.array([shape_zyx[2], shape_zyx[1], shape_zyx[0]], dtype=np.int64)
    spacing = np.asarray(spacing_xyz, dtype=np.float64)
    for resolution in resolution_staging:
        if isotropic_resample:
            scale = resolution * np.ones(3) / spacing
            new_size = np.array([int(sz / float(sf) + 0.5) for sz, sf in zip(size_xyz, scale)])
        else:
            new_size = np.array([int(sz / float(resolution) + 0.5) for sz in size_xyz])
        new_spacing = (size_xyz - 1) * spacing / (new_size - 1)
        out.append(
            (
                (int(new_size[2]), int(new_size[1]), int(new_size[0])),
                tuple(float(s) for s in new_spacing),
            )
        )
    return out


def _regrid(arr, from_spacing, to_spacing, to_shape_zyx, interp=INTERP_LINEAR,
            default_value=0.0):
    """Resample [z,y,x(,c)] between grids sharing origin/direction.

    Exact separable per-axis matmuls (MXU) — see interp.resample_separable.
    """
    from platipy_tpu.core.interp import resample_separable

    fs = np.asarray(from_spacing, dtype=np.float64)
    ts = np.asarray(to_spacing, dtype=np.float64)
    axis_maps = (
        (float(ts[0] / fs[0]), 0.0),
        (float(ts[1] / fs[1]), 0.0),
        (float(ts[2] / fs[2]), 0.0),
    )
    return resample_separable(arr, axis_maps, to_shape_zyx, interp=interp,
                              default_value=default_value)


def _warp_arr(arr, field, spacing_xyz, interp=INTERP_LINEAR, default_value=0.0,
              max_disp_vox=None):
    """Warp [z,y,x(,c)] by a same-grid DVF (mm, (x,y,z) components).

    Uses the multipass shift-and-select warp (VPU-friendly; XLA gather runs
    near-scalar on TPU).  ``max_disp_vox`` is the static per-axis displacement
    bound; defaults to 48 mm / spacing.
    """
    from platipy_tpu.core.interp import warp_multipass

    nz, ny, nx = field.shape[:3]
    sx, sy, sz = (float(s) for s in spacing_xyz)
    if max_disp_vox is None:
        max_disp_vox = (
            int(np.ceil(48.0 / sx)) + 1,
            int(np.ceil(48.0 / sy)) + 1,
            int(np.ceil(48.0 / sz)) + 1,
        )
    if arr.ndim == 4:
        # warp each component with the same offsets
        outs = [
            warp_multipass(
                arr[..., c], field[..., 0] / sx, field[..., 1] / sy, field[..., 2] / sz,
                max_disp_vox=max_disp_vox, default_value=default_value,
            )
            for c in range(arr.shape[-1])
        ]
        return jnp.stack(outs, axis=-1)
    if interp == INTERP_NEAREST:
        # NN via rounding the offsets to integers, then a 1-tap multipass
        field = jnp.round(
            jnp.stack(
                [
                    jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 2) + field[..., 0] / sx,
                    jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 1) + field[..., 1] / sy,
                    jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 0) + field[..., 2] / sz,
                ],
                axis=-1,
            )
        )
        off_x = field[..., 0] - jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 2)
        off_y = field[..., 1] - jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 1)
        off_z = field[..., 2] - jax.lax.broadcasted_iota(jnp.float32, (nz, ny, nx), 0)
        return warp_multipass(arr, off_x, off_y, off_z, max_disp_vox=max_disp_vox,
                              default_value=default_value)
    return warp_multipass(
        arr, field[..., 0] / sx, field[..., 1] / sy, field[..., 2] / sz,
        max_disp_vox=max_disp_vox, default_value=default_value,
    )


def _smooth_kernels(sigma, spacing_xyz, mode: str):
    """Kernels (z,y,x order) for pyramid / regularisation smoothing."""
    if not sigma:
        return None
    if hasattr(sigma, "__iter__"):
        variance = [s * s for s in sigma]
    else:
        variance = (sigma * sigma,) * 3
    spacing = np.asarray(spacing_xyz)
    max_width = int(max([8 * v * s for v, s in zip(variance, spacing)]))
    max_width = max(max_width, 2)
    var_vox = np.asarray(variance) / spacing**2
    if mode == "discrete":
        ks = [
            _filters.discrete_gaussian_kernel1d(var_vox[2], 0.01, max_width),
            _filters.discrete_gaussian_kernel1d(var_vox[1], 0.01, max_width),
            _filters.discrete_gaussian_kernel1d(var_vox[0], 0.01, max_width),
        ]
    else:
        sig_vox = np.sqrt(var_vox)
        ks = [
            _filters.gaussian_kernel1d(sig_vox[2]),
            _filters.gaussian_kernel1d(sig_vox[1]),
            _filters.gaussian_kernel1d(sig_vox[0]),
        ]
    return ks


# ---------------------------------------------------------------------------
# batched multiscale demons
# ---------------------------------------------------------------------------

def batched_multiscale_demons(
    fixed_arr: jnp.ndarray,
    moving_stack: jnp.ndarray,
    spacing_xyz: Tuple[float, float, float],
    resolution_staging: Sequence[float],
    iteration_staging: Sequence[int],
    smoothing_sigmas: Sequence[float],
    isotropic_resample: bool = True,
    regularisation_kernel_mm: float = 1.5,
    max_step_vox: float = 0.5,
    within_level_disp_vox: int = 4,
    maximum_rms_error=None,
    field_dtype: str = None,
    batch_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Multiscale demons of every atlas against the fixed image(s), batched.

    ``maximum_rms_error`` (mm): ITK PDE-framework per-level convergence (the
    reference's filter inherits default 0.99 mm); under vmap the level's
    while_loop runs until every atlas lane converges.  None keeps exact
    fixed trip counts.

    fixed_arr: [z,y,x] (shared) or [N,z,y,x] (per-atlas fixed, e.g. the
    cardiac pipeline's HU-gated masked targets); moving_stack: [N,z,y,x] on
    the SAME grid.  Returns DVF stack [N,z,y,x,3] (mm) on the fixed grid.

    Per level one jitted program runs: regrid fields, pre-warp, N demons loops
    under vmap, composition, total-field smoothing.  Sharding the leading axis
    makes each step chip-local.

    On a SINGLE device the atlas batch is processed in chunks of <=5: the
    10-lane level program runs ~20% slower per atlas than two 5-lane runs
    (measured r5 at the bench's fine level: 0.503 s vs 0.417 s per 30
    iterations — the larger working set falls off the effective stream
    rate; see docs/ROOFLINE.md).  Per-lane math is unchanged (measured <=1
    ulp from XLA's per-shape fusion choices); chunking is skipped when
    ``maximum_rms_error`` couples the lanes' while_loop trip count, and on
    multi-device meshes where the leading axis is sharded.
    """
    n_total = moving_stack.shape[0]
    if batch_chunk is None:
        # auto: chunk on a single device only (a sharded leading axis must
        # stay whole); PLATIPY_TPU_DEMONS_CHUNK=0 disables
        chunk = int(os.environ.get("PLATIPY_TPU_DEMONS_CHUNK", "5"))
        if len(jax.devices()) != 1:
            chunk = 0
    else:
        chunk = int(batch_chunk)
    if chunk > 0 and n_total > chunk and maximum_rms_error is None:
        k = -(-n_total // chunk)
        sizes = [n_total // k + (1 if i < n_total % k else 0) for i in range(k)]
        outs, o = [], 0
        for s in sizes:
            f = fixed_arr if fixed_arr.ndim == 3 else fixed_arr[o:o + s]
            outs.append(batched_multiscale_demons(
                f, moving_stack[o:o + s], spacing_xyz, resolution_staging,
                iteration_staging, smoothing_sigmas, isotropic_resample,
                regularisation_kernel_mm, max_step_vox, within_level_disp_vox,
                maximum_rms_error, field_dtype, batch_chunk=0,
            ))
            o += s
        return jnp.concatenate(outs, axis=0)

    shape_zyx = moving_stack.shape[1:]
    grids = level_grids(shape_zyx, spacing_xyz, resolution_staging, isotropic_resample)

    reg_kernel_vox = tuple(
        (np.array(regularisation_kernel_mm) / np.array(spacing_xyz)).tolist()
    )

    n = moving_stack.shape[0]
    dvf_stack = jnp.zeros(shape_zyx + (3,), jnp.float32)[None].repeat(n, axis=0)
    prev_shape, prev_spacing = shape_zyx, tuple(float(s) for s in spacing_xyz)

    for i, ((lvl_shape, lvl_spacing), sigma, iters) in enumerate(
        zip(grids, smoothing_sigmas, iteration_staging)
    ):
        dvf_stack = _demons_level_batched(
            fixed_arr,
            moving_stack,
            dvf_stack,
            full_shape=tuple(shape_zyx),
            full_spacing=tuple(float(s) for s in spacing_xyz),
            prev_shape=prev_shape,
            prev_spacing=prev_spacing,
            lvl_shape=lvl_shape,
            lvl_spacing=lvl_spacing,
            sigma_key=float(sigma) if not hasattr(sigma, "__iter__") else tuple(sigma),
            iterations=int(iters),
            reg_kernel_vox=reg_kernel_vox,
            max_step_vox=float(max_step_vox),
            within_level_disp_vox=int(within_level_disp_vox),
            max_rms_error=(None if maximum_rms_error is None
                           else float(maximum_rms_error)),
            # must be a static jit arg (not a trace-time global read): the
            # jit cache would otherwise key only on the other statics and
            # silently reuse the first-compiled dtype's program
            field_dtype_key=(field_dtype or DEMONS_FIELD_DTYPE),
        )
        prev_shape, prev_spacing = lvl_shape, lvl_spacing

    # final: regrid total field back to the fixed grid
    final = jax.vmap(
        lambda f: _regrid(f, prev_spacing, tuple(spacing_xyz), tuple(shape_zyx))
    )(dvf_stack)
    return final


@functools.partial(
    jax.jit,
    static_argnames=(
        "full_shape", "full_spacing", "prev_shape", "prev_spacing",
        "lvl_shape", "lvl_spacing", "sigma_key", "iterations",
        "reg_kernel_vox", "max_step_vox", "within_level_disp_vox",
        "max_rms_error", "field_dtype_key",
    ),
)
def _demons_level_batched(
    fixed_arr, moving_stack, dvf_stack, *,
    full_shape, full_spacing, prev_shape, prev_spacing,
    lvl_shape, lvl_spacing, sigma_key, iterations,
    reg_kernel_vox, max_step_vox, within_level_disp_vox=4,
    max_rms_error=None, field_dtype_key="float32",
):
    # pyramid smoothing kernels (reference DiscreteGaussian semantics)
    pyr_kernels = _smooth_kernels(sigma_key, full_spacing, "discrete")

    def make_level(arr):
        if pyr_kernels is not None:
            arr = _filters.convolve_separable(arr, pyr_kernels)
        return _regrid(arr, full_spacing, lvl_spacing, lvl_shape)

    if fixed_arr.ndim == 4:
        f_level = jax.vmap(make_level)(fixed_arr.astype(jnp.float32))
        fixed_batched = True
    else:
        f_level = make_level(fixed_arr.astype(jnp.float32))
        fixed_batched = False
    m_level = jax.vmap(make_level)(moving_stack.astype(jnp.float32))

    # bring running total DVF onto the level grid
    dvf_level = jax.vmap(
        lambda f: _regrid(f, prev_spacing, lvl_spacing, lvl_shape)
    )(dvf_stack)

    # pre-warp each moving level image through its running field
    m_warped = jax.vmap(
        lambda m, f: _warp_arr(m, f, lvl_spacing)
    )(m_level, dvf_level)

    # per-iteration field smoothing kernels (ITK PDE framework: err 0.1, w 30)
    def pde_kernels(sig_vox):
        s = np.asarray(sig_vox, dtype=np.float64).reshape(-1)
        if s.size == 1:
            s = np.repeat(s, 3)
        return tuple(
            tuple(float(v) for v in _filters.discrete_gaussian_kernel1d(s[k] ** 2, 0.1, 30))
            for k in (2, 1, 0)
        )

    # within a level the incremental field starts at zero (pre-warped moving)
    # and grows by <= max_step_vox per smoothed iteration, so a tight inner
    # bound suffices; between-level warps use the full mm bound.  Bound 4
    # measured DSC-neutral vs 8 on the cardiac bench and ~8% faster.
    max_disp = tuple(
        min(int(within_level_disp_vox), n - 1)
        for n in (lvl_shape[2], lvl_shape[1], lvl_shape[0])
    )
    demons = functools.partial(
        _demons_level_impl,
        iterations=iterations,
        spacing=lvl_spacing,
        std_kernels_key=pde_kernels(reg_kernel_vox),
        update_kernels_key=pde_kernels((1.0, 1.0, 1.0)),
        max_step_vox=max_step_vox,
        max_disp_vox=max_disp,
        # bf16 in-loop image warp: DSC-neutral on the atlas pipelines and
        # ~7% off the finest demons level (see _demons_level_impl)
        warp_dtype_key="bfloat16",
        # bf16 field/update STORAGE in the HBM-bound loop (see the
        # _demons_level_impl docstring; A/B'd on the bench: DSC unchanged)
        field_dtype_key=field_dtype_key,
        max_rms_error=max_rms_error,
    )
    zero_field = jnp.zeros(lvl_shape + (3,), jnp.float32)
    if fixed_batched:
        dvf_iter = jax.vmap(lambda f, m: demons(f, m, zero_field))(f_level, m_warped)
    else:
        dvf_iter = jax.vmap(lambda m: demons(f_level, m, zero_field))(m_warped)

    # compose: dvf_total += dvf_iter( x + dvf_total(x) )
    dvf_pulled = jax.vmap(
        lambda it, tot: _warp_arr(it, tot, lvl_spacing)
    )(dvf_iter, dvf_level)
    dvf_total = dvf_level + dvf_pulled

    # reference quirk: voxel-unit sigmas fed to the physical-unit smoother
    sig = np.asarray(reg_kernel_vox, dtype=np.float64).reshape(-1)
    if sig.size == 1:
        sig = np.repeat(sig, 3)
    sig_vox = sig / np.asarray(lvl_spacing)
    total_kernels = [
        _filters.gaussian_kernel1d(sig_vox[2]),
        _filters.gaussian_kernel1d(sig_vox[1]),
        _filters.gaussian_kernel1d(sig_vox[0]),
    ]
    dvf_total = _filters.convolve_separable(dvf_total, total_kernels, axes=(1, 2, 3))
    return dvf_total


@functools.lru_cache(maxsize=64)
def _cached_warp_by_dvf(spacing, interp, default_value):
    # a fresh ``@jax.jit`` closure per call re-traced + re-lowered the warp
    # on EVERY warm case (~0.3 s each of pure host work); the cached wrapper
    # traces once per (spacing, interp, default) and dispatches on the fast
    # path thereafter
    @jax.jit
    def run(s, d):
        return jax.vmap(
            lambda a, f: _warp_arr(a, f, spacing, interp=interp, default_value=default_value)
        )(s, d)

    return run


def batched_warp_by_dvf(
    stack: jnp.ndarray,
    dvf_stack: jnp.ndarray,
    spacing_xyz,
    interp=INTERP_LINEAR,
    default_value: float = 0.0,
) -> jnp.ndarray:
    """Warp a [N,z,y,x] stack by per-atlas DVFs on the same grid."""
    spacing = tuple(float(s) for s in spacing_xyz)
    return _cached_warp_by_dvf(spacing, int(interp), float(default_value))(
        stack, dvf_stack
    )


@functools.lru_cache(maxsize=64)
def _cached_warp_stacks_by_dvf(spacing, interp, default_value):
    @jax.jit
    def run(stacks, dvfs):
        warp_one = lambda a, f: _warp_arr(  # noqa: E731
            a, f, spacing, interp=interp, default_value=default_value
        )
        return jax.vmap(lambda grp: jax.vmap(warp_one)(grp, dvfs))(stacks)

    return run


def batched_warp_stacks_by_dvf(
    stacks: jnp.ndarray,
    dvf_stack: jnp.ndarray,
    spacing_xyz,
    interp=INTERP_LINEAR,
    default_value: float = 0.0,
) -> jnp.ndarray:
    """Warp an [S, N, z, y, x] stack-of-stacks by per-atlas DVFs (shared
    across the leading S axis) in ONE program — the all-structures flavour of
    :func:`batched_warp_by_dvf` (a per-structure loop pays S dispatches)."""
    spacing = tuple(float(s) for s in spacing_xyz)
    return _cached_warp_stacks_by_dvf(spacing, int(interp), float(default_value))(
        stacks, dvf_stack
    )


@functools.lru_cache(maxsize=256)
def _cached_bit_packer(shape, n_bits, append_validity):
    @jax.jit
    def pack(arrs):
        acc = jnp.zeros(shape, jnp.float32)
        for i in range(n_bits):
            acc = acc + (arrs[i] > 0).astype(jnp.float32) * np.float32(2.0**i)
        if append_validity:
            acc = acc + np.float32(2.0**n_bits)
        return acc

    return pack


def pack_binary_masks(arrays, append_validity: bool = False) -> jnp.ndarray:
    """Pack up to 24 same-grid binary masks into ONE f32 volume of integer
    bit patterns (bit i = mask i), as one device program.

    Nearest-neighbour resampling selects whole source voxels, so warping the
    packed volume is BITWISE-IDENTICAL to warping each mask separately while
    moving 1/n_bits of the gather traffic — the structure-propagation warps
    (linear + both demons stages) dominate the non-registration cost of the
    cardiac pipeline otherwise.  f32 holds integers exactly below 2**24.

    ``append_validity=True`` adds an everywhere-1 highest bit: after any warp
    with default 0 the extracted bit IS the in-bounds (validity) mask of that
    warp — free out-of-bounds detection for downstream gating.
    """
    arrays = list(arrays)
    n_eff = len(arrays) + (1 if append_validity else 0)
    if not arrays or n_eff > 24:
        raise ValueError(f"pack_binary_masks packs 1..24 masks, got {n_eff}")
    bad = [tuple(a.shape) for a in arrays if tuple(a.shape) != tuple(arrays[0].shape)]
    if bad:
        # a broadcast-compatible mismatch (e.g. a (y,x) mask among (z,y,x)
        # masks) would pack garbage silently instead of erroring
        raise ValueError(
            f"pack_binary_masks needs same-shape masks: got {tuple(arrays[0].shape)} "
            f"and {bad[0]}"
        )
    return _cached_bit_packer(
        tuple(arrays[0].shape), len(arrays), bool(append_validity)
    )(tuple(arrays))


@functools.lru_cache(maxsize=64)
def _cached_bit_unpacker(n_bits):
    @jax.jit
    def unpack(packed):
        # 0.5**i and floor/mod are exact on power-of-two-scaled f32 integers
        return jnp.stack([
            jnp.mod(jnp.floor(packed * np.float32(0.5**i)), 2.0)
            for i in range(n_bits)
        ])

    return unpack


def unpack_binary_masks(packed: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """Inverse of :func:`pack_binary_masks`: [...]-shaped packed volume ->
    [n_bits, ...] f32 0/1 stack, one device program."""
    return _cached_bit_unpacker(int(n_bits))(packed)


@functools.lru_cache(maxsize=64)
def _cached_bit_extractor(bit):
    @jax.jit
    def extract(packed):
        return jnp.mod(jnp.floor(packed * np.float32(0.5**bit)), 2.0)

    return extract


def extract_packed_bit(packed: jnp.ndarray, bit: int) -> jnp.ndarray:
    """One mask out of a :func:`pack_binary_masks` volume (f32 0/1)."""
    return _cached_bit_extractor(int(bit))(packed)


def batched_weight_maps(
    target_arr: jnp.ndarray,
    moving_stack: jnp.ndarray,
    spacing_xyz,
    vote_type: str = "unweighted",
    vote_params: Optional[dict] = None,
) -> jnp.ndarray:
    """Weight maps for every atlas at once (fusion.py:56-202 semantics)."""
    from platipy_tpu.label.fusion import DEFAULT_VOTE_PARAMS

    params = dict(DEFAULT_VOTE_PARAMS)
    if vote_params:
        params.update(vote_params)
    vote = vote_type.lower()
    target = target_arr.astype(jnp.float32)
    stack = moving_stack.astype(jnp.float32)

    if vote == "unweighted":
        return jnp.ones_like(stack)

    if vote == "global":
        sq = (stack - target[None]) ** 2
        w = params["factor"] / jnp.sum(sq, axis=(1, 2, 3))
        return jnp.broadcast_to(w[:, None, None, None], stack.shape).astype(jnp.float32)

    if vote == "local":
        sigma = params["sigma"]
        spacing = np.asarray(spacing_xyz)
        var_vox = (sigma * sigma) / spacing**2
        kernels = [
            _filters.discrete_gaussian_kernel1d(var_vox[2]),
            _filters.discrete_gaussian_kernel1d(var_vox[1]),
            _filters.discrete_gaussian_kernel1d(var_vox[0]),
        ]
        sq = (stack - target[None]) ** 2
        raw = _filters.convolve_separable(sq, kernels, axes=(1, 2, 3))
        return (raw + params["epsilon"]) ** -1.0

    if vote == "block":
        block = params["blockSize"]
        if isinstance(block, int):
            block = (block,) * 3
        kernels = [np.full(2 * int(r) + 1, 1.0 / (2 * int(r) + 1)) for r in
                   (block[2], block[1], block[0])]
        sq = (stack - target[None]) ** 2
        raw = _filters.convolve_separable(sq, kernels, axes=(1, 2, 3))
        # epsilon guard as in fusion.compute_weight_map: raw == 0 on identical
        # blocks would give inf weights and NaN fused probabilities
        return params["factor"] * ((raw + params["epsilon"]) ** -1.0) ** abs(params["gain"] / 2.0)

    raise ValueError(f"Unsupported batched vote_type {vote_type!r}")
