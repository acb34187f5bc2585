"""Linear registration — drop-in mirror of
platipy/imaging/registration/linear.py (reference lines 23-260).

The ITK ``ImageRegistrationMethod`` pipeline (multi-res pyramid, sampled
metric, finite-difference derivatives, C++ optimiser loop) becomes: per level,
one jit-compiled loss = metric(fixed_level, resample(moving_level, T)) whose
exact gradient flows through the trilinear resampler, minimised by
optax/JAX-native optimisers with ITK-style physical-shift parameter scaling.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST
from platipy_tpu.core.resample import resample
from platipy_tpu.core.transform import (
    AffineTransform,
    CompositeTransform,
    Euler3DTransform,
    ScaleSkewVersor3DTransform,
    ScaleTransform,
    ScaleVersor3DTransform,
    Similarity3DTransform,
    Transform,
    TranslationTransform,
    VersorRigid3DTransform,
    centered_transform_initializer,
)
from platipy_tpu.registration import metrics as _metrics
from platipy_tpu.registration.optimise import physical_shift_scales
from platipy_tpu.registration.utils import apply_transform, smooth_and_resample

__all__ = ["alignment_registration", "linear_registration",
           "linear_registration_batched"]


def alignment_registration(fixed_image: Image, moving_image: Image, moments: bool = True):
    """Single-step moments alignment (reference linear.py:23-47)."""
    moving_dtype = moving_image.array.dtype
    fixed32 = fixed_image.astype(jnp.float32)
    moving32 = moving_image.astype(jnp.float32)
    initial_transform = centered_transform_initializer(
        fixed32, moving32, "versor", moments=moments
    )
    aligned = resample(moving32, fixed32, initial_transform, interp=INTERP_LINEAR,
                       default_value=0.0, output_dtype=moving_dtype)
    return aligned, initial_transform


def _make_transform(reg_method: str, center) -> Transform:
    c = np.asarray(center, np.float32)  # host constant; device entry via jit args
    name = reg_method.lower()
    if name == "translation":
        return TranslationTransform(np.zeros(3, np.float32))
    if name == "similarity":
        return Similarity3DTransform(center=c)
    if name == "affine":
        return AffineTransform(center=c)
    if name == "rigid":
        return VersorRigid3DTransform(center=c)
    if name == "scale":
        return ScaleTransform(center=c)
    if name == "scaleversor":
        return ScaleVersor3DTransform(center=c)
    if name == "scaleskewversor":
        return ScaleSkewVersor3DTransform(center=c)
    raise ValueError(
        "You have selected a registration method that does not exist.\n Please select from"
        " Translation, Similarity, Affine, Rigid, ScaleVersor, ScaleSkewVersor"
    )


def _sample_points_for_scales(image: Image, n_per_axis: int = 4) -> jnp.ndarray:
    nx, ny, nz = image.size
    pts = []
    for iz in np.linspace(0, nz - 1, n_per_axis):
        for iy in np.linspace(0, ny - 1, n_per_axis):
            for ix in np.linspace(0, nx - 1, n_per_axis):
                pts.append(image.physical_point((ix, iy, iz)))
    return jnp.asarray(np.stack(pts), jnp.float32)


def _sampling_strides(sampling_rate, shape_zyx):
    """TPU-native equivalent of ITK REGULAR metric sampling (reference
    linear.py:151-153 samples 25% of voxels): stride the fixed evaluation
    grid in (y, x) so the kept fraction ~= sampling_rate.  Striding is
    deterministic and static-shaped (XLA-friendly), unlike point lists.
    Dims too small to stride (< 32 voxels after striding) stay dense —
    coarse pyramid levels are cheap and need every sample."""
    if not sampling_rate or sampling_rate >= 0.75:
        return 1, 1
    if sampling_rate >= 0.4:
        sy, sx = 1, 2
    elif sampling_rate >= 0.2:
        sy, sx = 2, 2
    elif sampling_rate >= 0.1:
        sy, sx = 2, 4
    else:
        sy, sx = 4, 4
    if shape_zyx[1] // sy < 32:
        sy = 1
    if shape_zyx[2] // sx < 32:
        sx = 1
    return sy, sx


def _stride_i2p(ref_i2p, sy, sx):
    """Index->physical matrix of the (1, sy, sx)-strided grid: scale the x/y
    index-axis columns (homogeneous 4x4, columns = (x, y, z, 1) index axes).

    Computed in numpy — a default-precision jnp matmul runs bf16 on TPU and
    corrupts the physical grid the metric is optimised against."""
    scale = np.diag([sx, sy, 1.0, 1.0])
    return jnp.asarray(np.asarray(ref_i2p, dtype=np.float64) @ scale,
                       jnp.float32)


def _make_level_loss(metric_name, shape_zyx, has_fmask, has_mmask):
    """Level loss: metric(fixed, warp(moving, initial∘T)) with ITK
    out-of-buffer exclusion and optional metric masks.

    Warping inside the loss uses the gather-free shear-factorised affine
    resample (XLA gathers run near-scalar on TPU and dominated the
    optimisation loop); final resamples outside the loss stay exact trilinear.
    """
    from platipy_tpu.core.interp import affine_shear_resample
    from platipy_tpu.core.resample import _linear_hmatrix_jnp

    metric_fn = _metrics.get_metric(metric_name)
    hp = jax.lax.Precision.HIGHEST

    def loss(t, initial_transform, f_arr, m_arr, f_mask, m_mask, ref_i2p, mov_p2i):
        total = CompositeTransform([initial_transform, t])
        t_h = _linear_hmatrix_jnp(total).astype(jnp.float32)
        total_mat = jnp.matmul(
            jnp.matmul(mov_p2i, t_h, precision=hp), ref_i2p, precision=hp
        )
        warped, inside = affine_shear_resample(
            m_arr, total_mat, shape_zyx, default_value=0.0
        )
        weight = inside.astype(jnp.float32)
        if has_fmask:
            weight = weight * (f_mask > 0.5).astype(jnp.float32)
        if has_mmask:
            m_w, _ = affine_shear_resample(
                m_mask, total_mat, shape_zyx, default_value=0.0
            )
            weight = weight * (m_w > 0.5).astype(jnp.float32)
        metric_value = metric_fn(f_arr, warped, weight)
        # guard the degenerate "everything maps outside" minimum of
        # valid-count-normalised metrics (ITK raises here; see the same
        # guard in bspline_registration) — on the INSIDE fraction only, so
        # small metric masks stay legitimate
        frac_inside = jnp.mean(inside.astype(jnp.float32))
        return jnp.where(frac_inside < 0.25, jnp.float32(1e30), metric_value)

    return loss


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric_name", "optimiser", "iterations", "shape_zyx", "has_fmask", "has_mmask",
        "convergence_window", "convergence_tolerance",
    ),
)
def _register_level(
    opt_transform,
    initial_transform,
    f_arr,
    m_arr,
    f_mask,
    m_mask,
    ref_i2p,
    mov_p2i,
    scales,
    max_step,
    learning_rate,
    *,
    metric_name: str,
    optimiser: str,
    iterations: int,
    shape_zyx,
    has_fmask: bool,
    has_mmask: bool,
    convergence_window: int = 0,
    convergence_tolerance: float = 1e-6,
):
    """One multi-resolution level's optimisation as a single XLA program.

    Compiled once per (transform type, metric, optimiser, level shape) and
    reused across every atlas registration in a pipeline — the compile-count
    killer for the N-atlas outer loop.

    The optimiser bodies intentionally re-state the accept/reject loops of
    ``optimise.optimise`` in jit-compatible form (fori_loop carries, no
    Python-side convergence breaks) — and 'gradient_descent_line_search'
    here evaluates its 8 backtracking candidates as one vmapped batch where
    the eager path backtracks sequentially: same accepted step, different
    wall-clock shape.  Keep both in sync when touching either.
    """
    from platipy_tpu.registration.optimise import split_trainable

    loss = _make_level_loss(metric_name, shape_zyx, has_fmask, has_mmask)
    params, rebuild = split_trainable(opt_transform)

    def loss_of_params(p):
        return loss(rebuild(p), initial_transform, f_arr, m_arr, f_mask, m_mask,
                    ref_i2p, mov_p2i)

    value_and_grad = jax.value_and_grad(loss_of_params)

    def scaled(g):
        return {k: g[k] / scales[k] for k in g}

    def estimated_lr(g):
        sq = sum(jnp.sum(g[k] * g[k] / scales[k]) for k in g)
        shift = jnp.sqrt(jnp.maximum(sq, 1e-20))
        return learning_rate * max_step / shift

    v0, g0 = value_and_grad(params)
    lr0 = estimated_lr(g0)

    # Convergence stopping (opt-in): end a level once the relative metric
    # improvement has stayed below ``convergence_tolerance`` for
    # ``convergence_window`` consecutive effective iterations.  ITK's v4
    # optimisers stop on a convergence-window energy slope the same way, so
    # fixed trip counts actually OVERSHOOT reference behaviour; under vmap
    # the while_loop runs until every atlas lane converges, so the saving is
    # real wall-clock on the batched pipelines.  The loop (and its
    # rejected-step stall accounting) is shared with the eager path:
    # optimise.windowed_loop.
    from platipy_tpu.registration.optimise import windowed_loop

    def _loop(one_step, carry0, done_fn=None):
        return windowed_loop(
            one_step, carry0, iterations, convergence_window,
            convergence_tolerance, done_fn=done_fn,
        )

    if optimiser in ("gradient_descent", "cgls"):
        def gd_step(carry):
            p, lr, v = carry
            _, g = value_and_grad(p)
            g = scaled(g)
            cand = jax.tree_util.tree_map(lambda x, gi: x - lr * gi, p, g)
            v_cand = loss_of_params(cand)
            accept = v_cand < v
            p = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), cand, p)
            v = jnp.where(accept, v_cand, v)
            lr = jnp.where(accept, lr * 1.1, lr * 0.5)
            return p, lr, v

        # step length collapsed (ITK regular-step minStep analogue): a lane
        # parked at its optimum rejects every candidate and must still end
        p_opt, _, final = _loop(gd_step, (params, lr0, v0),
                                done_fn=lambda c: c[1] < lr0 * 1e-5)

    elif optimiser == "gradient_descent_line_search":
        # parallel line search: evaluate all candidate step lengths in ONE
        # batched pass (a sequential backtracking loop is launch-bound on TPU
        # — ~9 tiny dependent kernels per iteration) and take the best step
        ls_factors = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125],
                                 jnp.float32)

        def gdls_step(carry):
            p, rej, v = carry
            _, g = value_and_grad(p)
            g = scaled(g)

            def cand_loss(factor):
                cand = jax.tree_util.tree_map(
                    lambda x, gi: x - (lr0 * factor) * gi, p, g
                )
                return loss_of_params(cand)

            losses = jax.vmap(cand_loss)(ls_factors)
            best = jnp.argmin(losses)
            vc = losses[best]
            lr_best = lr0 * ls_factors[best]
            accept = vc < v
            p_new = jax.tree_util.tree_map(
                lambda x, gi: jnp.where(accept, x - lr_best * gi, x), p, g
            )
            rej = jnp.where(accept, 0, rej + 1)
            return p_new, rej, jnp.where(accept, vc, v)

        # a rejected line search repeats deterministically (same p, same lr
        # ladder), so two consecutive rejections mean the lane is stuck at
        # its optimum — end it rather than run to the hard cap
        p_opt, _, final = _loop(gdls_step, (params, jnp.int32(0), v0),
                                done_fn=lambda c: c[1] >= 2)

    elif optimiser in ("lbfgsb", "lbfgs", "lbfgs2"):
        import optax

        sqrt_s = {k: jnp.sqrt(scales[k]) for k in scales}

        def to_q(p):
            return {k: p[k] * sqrt_s[k] for k in p}

        def from_q(q):
            return {k: q[k] / sqrt_s[k] for k in q}

        def loss_q(q):
            return loss_of_params(from_q(q))

        vg_q = jax.value_and_grad(loss_q)
        opt = optax.lbfgs()
        q0 = to_q(params)
        state0 = opt.init(q0)
        vq0, gq0 = vg_q(q0)

        # best-iterate safeguard (see optimise.optimise lbfgs branch): a
        # failed zoom linesearch can run away; return the best finite iterate
        def body(carry):
            q, state, g, best_q, best_v, v = carry
            updates, state = opt.update(g, state, q, value=v, grad=g, value_fn=loss_q)
            q = optax.apply_updates(q, updates)
            v, g = vg_q(q)
            better = jnp.isfinite(v) & (v < best_v)
            best_q = jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, a, b), q, best_q
            )
            best_v = jnp.where(better, v, best_v)
            return q, state, g, best_q, best_v, v

        carry = _loop(body, (q0, state0, gq0, q0, vq0, vq0),
                      done_fn=lambda c: jnp.logical_not(jnp.isfinite(c[-1])))
        _, _, _, best_q, final, _ = carry
        p_opt = from_q(best_q)

    else:
        raise ValueError(f"Unknown optimiser {optimiser!r}")

    return rebuild(p_opt), final


def linear_registration(
    fixed_image: Image,
    moving_image: Image,
    fixed_structure: Optional[Image] = None,
    moving_structure: Optional[Image] = None,
    reg_method="similarity",
    metric: str = "mean_squares",
    optimiser: str = "gradient_descent",
    shrink_factors: Sequence[int] = (8, 2, 1),
    smooth_sigmas: Sequence[float] = (4, 2, 0),
    sampling_rate: float = 0.25,
    final_interp=INTERP_LINEAR,
    number_of_iterations: int = 50,
    default_value=None,
    verbose: bool = False,
    convergence_window: int = 0,
    convergence_tolerance: float = 1e-6,
):
    """Multi-resolution linear registration (reference linear.py:50-260).

    ``convergence_window`` > 0 ends each level early once the relative
    metric improvement has stayed below ``convergence_tolerance`` for that
    many consecutive effective iterations (see ``optimise.windowed_loop``);
    0 keeps the exact fixed trip count.

    ``sampling_rate`` maps ITK's REGULAR 25% sampling onto a strided metric
    grid: the y/x axes of the fixed level are subsampled by deterministic
    strides chosen so the kept fraction approximates the rate (see
    ``_sampling_strides``; axes shorter than 32 voxels stay dense).  The
    metric is deterministic — no RNG — so results are reproducible like the
    reference's fixed seed=42.
    Returns (registered_image, CompositeTransform([initial, optimised])).
    """
    fixed_image32 = fixed_image.astype(jnp.float32)
    moving_dtype = moving_image.array.dtype
    moving_image32 = moving_image.astype(jnp.float32)

    # initial alignment: geometric-centre Euler3D (reference linear.py:129-131)
    initial_transform = centered_transform_initializer(
        fixed_image32, moving_image32, "euler", moments=False
    )

    metric_fn = _metrics.get_metric(metric)

    # transform to optimise, centred like ITK (centre stays at the initial
    # transform's centre = fixed image geometric centre)
    if isinstance(reg_method, str):
        opt_transform = _make_transform(reg_method, np.asarray(initial_transform.center))
    elif isinstance(reg_method, Transform):
        opt_transform = reg_method
    else:
        raise ValueError(
            "'reg_method' must be either a string (see docs for acceptable registration "
            "names), or a custom Transform."
        )

    for level, (shrink, sigma) in enumerate(zip(shrink_factors, smooth_sigmas)):
        f_level = smooth_and_resample(
            fixed_image32, shrink_factor=shrink if shrink != 1 else None,
            smoothing_sigma=sigma if sigma else None,
        )
        m_level = smooth_and_resample(
            moving_image32, shrink_factor=shrink if shrink != 1 else None,
            smoothing_sigma=sigma if sigma else None,
        )
        f_mask_level = None
        if fixed_structure is not None:
            f_mask_level = resample(
                fixed_structure.astype(jnp.float32), f_level, None,
                interp=INTERP_NEAREST, default_value=0.0,
            )
        m_mask_level = None
        if moving_structure is not None:
            # bring the moving mask onto the moving level grid so the level's
            # index mapping applies to it too
            m_mask_level = resample(
                moving_structure.astype(jnp.float32), m_level, None,
                interp=INTERP_NEAREST, default_value=0.0,
            )

        scales = physical_shift_scales(opt_transform, _sample_points_for_scales(f_level))
        scales = {k: jnp.asarray(v, jnp.float32) for k, v in scales.items()}

        from platipy_tpu.core.image import index_to_physical_matrix, physical_to_index_matrix

        ref_i2p = jnp.asarray(
            index_to_physical_matrix(f_level.origin, f_level.spacing, f_level.direction),
            jnp.float32,
        )
        mov_p2i = jnp.asarray(
            physical_to_index_matrix(m_level.origin, m_level.spacing, m_level.direction),
            jnp.float32,
        )
        # REGULAR metric sampling as fixed-grid striding (linear.py:151-153)
        sy, sx = _sampling_strides(sampling_rate, f_level.spatial_shape)
        f_arr_lvl = f_level.array.astype(jnp.float32)[:, ::sy, ::sx]
        if (sy, sx) != (1, 1):
            ref_i2p = _stride_i2p(ref_i2p, sy, sx)
        dummy = jnp.zeros((1, 1, 1), jnp.float32)

        opt_transform, final_loss = _register_level(
            opt_transform,
            initial_transform,
            f_arr_lvl,
            m_level.array.astype(jnp.float32),
            f_mask_level.array[:, ::sy, ::sx] if f_mask_level is not None else dummy,
            m_mask_level.array if m_mask_level is not None else dummy,
            ref_i2p,
            mov_p2i,
            scales,
            jnp.float32(max(f_level.spacing)),
            jnp.float32(1.0),
            metric_name=metric.lower(),
            optimiser=optimiser.lower(),
            iterations=int(number_of_iterations),
            shape_zyx=f_arr_lvl.shape,
            has_fmask=f_mask_level is not None,
            has_mmask=m_mask_level is not None,
            convergence_window=int(convergence_window),
            convergence_tolerance=float(convergence_tolerance),
        )
        if verbose:
            print(f"level {level} (shrink {shrink}): metric = {float(final_loss):.6f}")

    combined_transform = CompositeTransform([initial_transform, opt_transform])

    if default_value is None:
        default_value = 0
        if float(np.asarray(moving_image32.array).min()) <= -1000:
            default_value = -1000

    registered_image = apply_transform(
        input_image=moving_image32,
        reference_image=fixed_image32,
        transform=combined_transform,
        default_value=default_value,
        interpolator=final_interp,
    )
    if not jnp.issubdtype(moving_dtype, jnp.floating):
        registered_image = registered_image.with_array(
            jnp.rint(registered_image.array).astype(moving_dtype)
        )
    else:
        registered_image = registered_image.astype(moving_dtype)

    return registered_image, combined_transform


def linear_registration_batched(
    fixed_image: Image,
    moving_images,
    reg_method="similarity",
    metric: str = "mean_squares",
    optimiser: str = "gradient_descent",
    shrink_factors: Sequence[int] = (8, 2, 1),
    smooth_sigmas: Sequence[float] = (4, 2, 0),
    sampling_rate: float = 0.25,
    final_interp=INTERP_LINEAR,
    number_of_iterations: int = 50,
    default_value=None,
    verbose: bool = False,
    convergence_window: int = 0,
    as_stack: bool = False,
    return_stacked_transform: bool = False,
):
    """Register N moving images to one fixed image as ONE batched program.

    ``return_stacked_transform=True`` appends a third return value: ONE
    transform pytree with a leading batch axis (feed it straight to
    ``apply_transforms_batched`` — no per-atlas slices or re-stacks).

    ``as_stack=True`` returns ``(registered_stack, transforms)`` with the
    registered volumes as ONE [N, z, y, x] float32 array instead of a list of
    Images — callers that immediately re-stack (the atlas pipelines) skip N
    per-atlas device slices that way.

    ``convergence_window`` > 0 ends each level early once every atlas's
    relative metric improvement has stayed below 1e-6 for that many
    consecutive iterations (ITK v4 optimisers converge the same way;
    ``number_of_iterations`` stays the hard cap).  0 keeps the exact
    fixed-trip-count behaviour.

    The atlas-parallel counterpart of :func:`linear_registration`: all moving
    images must share a grid (shape/spacing/origin/direction); pyramids,
    per-level optimisation and the final resamples all run as single batched
    dispatches over the stacked atlas axis (remote-dispatch latency is the
    enemy: the serial path pays ~0.5 s per eager call on tunnelled backends).

    Returns (list of registered Images, list of CompositeTransforms).
    """
    from platipy_tpu.core.image import index_to_physical_matrix, physical_to_index_matrix
    from platipy_tpu.core import filters as _filters
    from platipy_tpu.core.interp import resample_separable

    # opt-in sub-stage attribution (PLATIPY_TPU_PROFILE=1): laps land in
    # module-level LAST_LINEAR_SUBSTAGES for bench.py-style reporting
    import os as _os

    timer = None
    if _os.environ.get("PLATIPY_TPU_PROFILE") == "1":
        from platipy_tpu.utils.profiling import StageTimer

        timer = StageTimer()

    moving_images = list(moving_images)
    n = len(moving_images)
    ref0 = moving_images[0]
    sp0 = np.asarray(ref0.spacing, np.float64)
    dir0 = np.asarray(ref0.direction, np.float64)
    compatible = all(
        np.allclose(np.asarray(m.spacing, np.float64), sp0, atol=1e-5)
        and np.allclose(np.asarray(m.direction, np.float64), dir0, atol=1e-5)
        for m in moving_images[1:]
    )
    if not compatible:
        # fall back to the serial path when spacing/direction differ; mere
        # shape/origin differences (e.g. crop_atlas_to_structures,
        # reference multiatlas run.py:167-190) stay on the batched path below
        results = [
            linear_registration(
                fixed_image, m, reg_method=reg_method, metric=metric,
                optimiser=optimiser, shrink_factors=shrink_factors,
                smooth_sigmas=smooth_sigmas, sampling_rate=sampling_rate,
                final_interp=final_interp,
                number_of_iterations=number_of_iterations,
                default_value=default_value, verbose=verbose,
                convergence_window=convergence_window,
            )
            for m in moving_images
        ]
        serial_combined = [r[1] for r in results]
        extra = ()
        if return_stacked_transform:
            extra = (jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *serial_combined
            ),)
        if as_stack:
            # registered outputs all live on the fixed grid -> stackable
            return (
                jnp.stack([r[0].array.astype(jnp.float32) for r in results]),
                serial_combined,
            ) + extra
        return ([r[0] for r in results], serial_combined) + extra

    fixed32 = fixed_image.astype(jnp.float32)
    moving_dtype = ref0.array.dtype
    shapes = np.array([m.array.shape for m in moving_images])
    pad_shape = tuple(int(v) for v in shapes.max(axis=0))

    if not isinstance(reg_method, str):
        raise ValueError("batched registration requires a string reg_method")
    _metrics.get_metric(metric)  # validate

    # initial transforms (geometric-centre Euler — host math on static
    # metadata, no device ops)
    initials = [
        centered_transform_initializer(fixed32, m, "euler", moments=False)
        for m in moving_images
    ]
    initial_stack = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *initials
    )
    opt_transforms = [
        _make_transform(reg_method, np.asarray(t.center)) for t in initials
    ]
    opt_stack = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *opt_transforms
    )

    pad_size_xyz = (pad_shape[2], pad_shape[1], pad_shape[0])
    spacing_xyz = tuple(float(s) for s in ref0.spacing)
    fixed_spacing = tuple(float(s) for s in fixed32.spacing)
    fixed_size_xyz = (fixed32.spatial_shape[2], fixed32.spatial_shape[1],
                      fixed32.spatial_shape[0])

    from platipy_tpu.core.interp import interp_name

    interp_code = final_interp if isinstance(final_interp, int) else interp_name(final_interp)

    program = _cached_batched_linreg_program(
        n, tuple(tuple(int(v) for v in s) for s in shapes),
        tuple(fixed32.spatial_shape), fixed_spacing, spacing_xyz,
        tuple(int(s) for s in shrink_factors),
        tuple(float(s) for s in smooth_sigmas),
        float(sampling_rate) if sampling_rate else 0.0,
        metric.lower(), optimiser.lower(), int(number_of_iterations),
        int(convergence_window), int(interp_code),
        default_value is None,
        0.0 if default_value is None else float(default_value),
    )

    # host-side per-level matrices + parameter scales (all tiny; the scales
    # jacobian runs on the local CPU backend and is memoised centre-relative,
    # so cases whose crop origin moved still hit the cache)
    def grid_for(size_xyz, spacing, shrink):
        if not shrink or shrink == 1:
            return (size_xyz[2], size_xyz[1], size_xyz[0]), tuple(spacing)
        new_size = [max(int(sz / float(shrink) + 0.5), 2) for sz in size_xyz]
        new_spacing = tuple(
            ((so - 1) * sp) / (sn - 1)
            for so, sp, sn in zip(size_xyz, spacing, new_size)
        )
        return (new_size[2], new_size[1], new_size[0]), new_spacing

    ref_i2p_lvls, mov_p2i_lvls, scales_stacks = [], [], []
    for shrink in shrink_factors:
        f_shape_l, f_spacing_l = grid_for(fixed_size_xyz, fixed_spacing, shrink)
        _, m_spacing_l = grid_for(pad_size_xyz, spacing_xyz, shrink)
        ref_i2p = index_to_physical_matrix(
            fixed32.origin, f_spacing_l, fixed32.direction
        )
        sy, sx = _sampling_strides(sampling_rate, f_shape_l)
        if (sy, sx) != (1, 1):
            ref_i2p = np.asarray(ref_i2p, np.float64) @ np.diag([sx, sy, 1.0, 1.0])
        ref_i2p_lvls.append(np.asarray(ref_i2p, np.float32))
        mov_p2i_lvls.append(np.stack([
            np.asarray(
                physical_to_index_matrix(m.origin, m_spacing_l, ref0.direction),
                np.float32,
            )
            for m in moving_images
        ]))
        f_size_l = (f_shape_l[2], f_shape_l[1], f_shape_l[0])
        pts = _sample_points_np(f_size_l, fixed32.origin, f_spacing_l,
                                fixed32.direction)
        scales_one = _physical_shift_scales_centered(
            reg_method, np.asarray(initials[0].center), pts
        )
        scales_stacks.append({
            k: jnp.broadcast_to(
                jnp.asarray(v, jnp.float32), (n,) + np.asarray(v).shape
            )
            for k, v in scales_one.items()
        })

    ref_i2p_full = np.asarray(
        index_to_physical_matrix(fixed32.origin, fixed32.spacing, fixed32.direction),
        np.float32,
    )
    mov_p2i_full = np.stack([
        np.asarray(
            physical_to_index_matrix(m.origin, m.spacing, m.direction), np.float32
        )
        for m in moving_images
    ])

    if timer:
        timer.lap("host_staging")

    registered_stack, opt_stack, losses = program(
        fixed32.array, tuple(m.array for m in moving_images),
        opt_stack, initial_stack, tuple(scales_stacks),
        jnp.asarray(np.stack(ref_i2p_lvls)), jnp.asarray(np.stack(mov_p2i_lvls)),
        jnp.asarray(ref_i2p_full), jnp.asarray(mov_p2i_full),
    )
    if verbose:
        print(f"batched final level losses = {np.asarray(losses)}")
    if timer:
        timer.lap("fused_program", sync=losses)

    if interp_code != INTERP_LINEAR:
        # the fused program skipped its (linear) final warp; dispatch the
        # interpolation-specific one on the padded stack it returned
        if default_value is None:
            default_value = 0
            if float(jnp.min(registered_stack)) <= -1000:
                default_value = -1000
        registered_stack = _cached_batched_final_warp(
            fixed32.spatial_shape, int(interp_code), float(default_value)
        )(opt_stack, initial_stack, registered_stack,
          jnp.asarray(ref_i2p_full), jnp.asarray(mov_p2i_full))

    if timer:
        timer.lap("final_warp", sync=registered_stack)
        import sys

        sys.modules[__name__].LAST_LINEAR_SUBSTAGES = dict(timer.times)

    # per-atlas transforms with HOST leaves: slicing the stacked pytree on
    # device costs n_atlases x n_leaves tiny dispatches (~0.5 s per pipeline
    # call over a tunnelled backend); one small device_get then numpy slicing
    # is free, and the per-atlas transforms are parity bookkeeping consumed
    # (if at all) by later jit programs that re-upload the tiny leaves anyway
    opt_host = jax.device_get(opt_stack)
    opt_list = [
        jax.tree_util.tree_map(lambda leaf: leaf[k], opt_host) for k in range(n)
    ]
    combined = [CompositeTransform([initials[k], opt_list[k]]) for k in range(n)]
    extra = ()
    if return_stacked_transform:
        extra = (CompositeTransform([initial_stack, opt_stack]),)

    if as_stack:
        return (registered_stack, combined) + extra

    registered = []
    for k in range(n):
        arr = registered_stack[k]
        if not jnp.issubdtype(moving_dtype, jnp.floating):
            arr = jnp.rint(arr).astype(moving_dtype)
        else:
            arr = arr.astype(moving_dtype)
        registered.append(
            Image(arr, fixed32.origin, fixed32.spacing, fixed32.direction)
        )

    return (registered, combined) + extra


def apply_transforms_batched(
    transforms,
    moving_images,
    reference_image: Image,
    interpolator=INTERP_NEAREST,
    default_value: float = 0.0,
    as_stack: bool = False,
    tile: int = 1,
):
    """Warp N same-grid images through N same-structure transforms in ONE
    batched dispatch (the serial ``apply_transform`` loop pays one remote
    dispatch per call; reference multiatlas run.py:283-299 loops sitk.Resample).

    ``transforms`` is either a list of N per-image transforms, or ONE
    transform pytree whose leaves carry a leading batch axis of size N (the
    ``return_stacked_transform`` output of :func:`linear_registration_batched`
    — skips the N per-atlas pytree slices AND the re-stack).  ``tile`` > 1
    applies the same N transforms to ``tile * N`` images grouped
    group-major (image k uses transform ``k % N``) — one dispatch for every
    structure of every atlas.

    Returns a list of Images on the reference grid, cast back to the moving
    dtype (rounded for integer masks) — or, with ``as_stack=True``, the raw
    [N, z, y, x] float32 array (skips N per-image device slices).
    """
    from platipy_tpu.core.image import index_to_physical_matrix, physical_to_index_matrix

    moving_images = list(moving_images)
    mov0 = moving_images[0]
    moving_dtype = mov0.array.dtype
    # moving images may live on different grids (per-atlas crops): pad to a
    # common shape with the resample's default value (out-of-domain points
    # would return it anyway) and stack per-image physical->index matrices.
    # Padding + stacking (of images AND transform pytrees) happens INSIDE the
    # cached program: the eager per-image pad/stack chain paid ~40 dispatches
    # (~0.6 s over a tunnelled device link) per pipeline call.
    shapes = tuple(tuple(int(v) for v in m.array.shape) for m in moving_images)
    ref = reference_image
    ref_i2p = jnp.asarray(
        index_to_physical_matrix(ref.origin, ref.spacing, ref.direction), jnp.float32
    )
    mov_p2i = jnp.asarray(
        np.stack([
            physical_to_index_matrix(m.origin, m.spacing, m.direction)
            for m in moving_images
        ]),
        jnp.float32,
    )
    from platipy_tpu.core.interp import interp_name

    interp_code = interpolator if isinstance(interpolator, int) else interp_name(interpolator)

    stacked = isinstance(transforms, Transform)
    if not stacked and tile != 1:
        raise ValueError("tile > 1 requires a stacked transform pytree")
    if stacked:
        out = _apply_batched_full_stacked(
            shapes, ref.spatial_shape, int(interp_code), float(default_value),
            int(tile),
        )(transforms, tuple(m.array for m in moving_images), ref_i2p, mov_p2i)
    else:
        out = _apply_batched_full(shapes, ref.spatial_shape, int(interp_code),
                                  float(default_value))(
            tuple(m.array for m in moving_images), tuple(transforms),
            ref_i2p, mov_p2i,
        )
    if as_stack:
        return out
    images = []
    for k in range(len(moving_images)):
        arr = out[k]
        if not jnp.issubdtype(moving_dtype, jnp.floating):
            arr = jnp.rint(arr).astype(moving_dtype)
        else:
            arr = arr.astype(moving_dtype)
        images.append(Image(arr, ref.origin, ref.spacing, ref.direction))
    return images


@functools.partial(
    jax.jit, static_argnames=("shape_zyx", "interp_code", "default_value")
)
def _apply_batched_jit(tfm_stack, stack, ref_i2p, mov_p2i, *, shape_zyx,
                       interp_code, default_value):
    from platipy_tpu.core.resample import _resample_linear_impl

    def warp_one(t, m, p2i):
        return _resample_linear_impl(
            m, t, ref_i2p, p2i, shape_zyx=shape_zyx,
            interp_code=interp_code, default_value=default_value,
            out_dtype_name="float32",
        )

    return jax.vmap(warp_one, in_axes=(0, 0, 0))(tfm_stack, stack, mov_p2i)


@functools.lru_cache(maxsize=None)
def _apply_batched_full(moving_shapes, ref_shape, interp_code, default_value):
    """ONE program: pad each image to the common shape, stack images and
    transform pytrees, and run the batched warp (see apply_transforms_batched)."""
    pad_shape = tuple(int(v) for v in np.max(np.array(moving_shapes), axis=0))

    def fn(moving_arrs, transforms, ref_i2p, mov_p2i):
        padded = []
        for m in moving_arrs:
            m = m.astype(jnp.float32)
            pads = [(0, t - s) for t, s in zip(pad_shape, m.shape)]
            if any(p[1] for p in pads):
                m = jnp.pad(m, pads, constant_values=jnp.float32(default_value))
            padded.append(m)
        stack = jnp.stack(padded)
        tfm_stack = jax.tree_util.tree_map(lambda *l: jnp.stack(l), *transforms)
        return _apply_batched_jit(
            tfm_stack, stack, ref_i2p, mov_p2i,
            shape_zyx=ref_shape, interp_code=interp_code,
            default_value=default_value,
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _apply_batched_full_stacked(moving_shapes, ref_shape, interp_code,
                                default_value, tile):
    """ONE program: pad each image to the common shape, stack, tile the
    already-stacked transform pytree ``tile`` times along its batch axis, and
    run the batched warp (the stacked-transform flavour of
    ``_apply_batched_full`` — no per-atlas pytree slices or re-stacks)."""
    pad_shape = tuple(int(v) for v in np.max(np.array(moving_shapes), axis=0))

    def fn(tfm_stacked, moving_arrs, ref_i2p, mov_p2i):
        padded = []
        for m in moving_arrs:
            m = m.astype(jnp.float32)
            pads = [(0, t - s) for t, s in zip(pad_shape, m.shape)]
            if any(p[1] for p in pads):
                m = jnp.pad(m, pads, constant_values=jnp.float32(default_value))
            padded.append(m)
        stack = jnp.stack(padded)
        tfm = tfm_stacked
        if tile > 1:
            tfm = jax.tree_util.tree_map(
                lambda l: jnp.concatenate([l] * tile, axis=0), tfm
            )
        return _apply_batched_jit(
            tfm, stack, ref_i2p, mov_p2i,
            shape_zyx=ref_shape, interp_code=interp_code,
            default_value=default_value,
        )

    return jax.jit(fn)


def _sample_points_np(size_xyz, origin, spacing, direction, n_per_axis: int = 4):
    """Host-side replica of _sample_points_for_scales (no device ops):
    physical points of an n^3 lattice over the given grid."""
    nx, ny, nz = size_xyz
    r = np.asarray(direction, np.float64).reshape(3, 3)
    sp = np.asarray(spacing, np.float64)
    o = np.asarray(origin, np.float64)
    pts = []
    for iz in np.linspace(0, nz - 1, n_per_axis):
        for iy in np.linspace(0, ny - 1, n_per_axis):
            for ix in np.linspace(0, nx - 1, n_per_axis):
                pts.append(o + r @ (sp * np.array([ix, iy, iz])))
    return np.stack(pts).astype(np.float32)


def _physical_shift_scales_centered(reg_method, center, pts_np):
    """physical_shift_scales with the grid canonicalised about the transform
    centre: the jacobian of every linear transform family depends on sample
    points only through (p - center), so shifting both to a zero centre makes
    the memoised scales cache hit across cases whose crop origin moved."""
    template0 = _make_transform(reg_method, np.zeros(3, np.float32))
    pts_rel = jnp.asarray(pts_np - np.asarray(center, np.float64), jnp.float32)
    return physical_shift_scales(template0, pts_rel)


@functools.lru_cache(maxsize=None)
def _cached_batched_linreg_program(
    n, moving_shapes, fixed_shape, fixed_spacing, moving_spacing,
    shrinks, sigmas, sampling_rate, metric_name, optimiser, iterations,
    convergence_window, interp_code, sniff_default, static_default,
):
    """ONE jit program for the whole batched linear registration: per-atlas
    padding + stacking, fixed and moving pyramids, every level's optimisation
    loop, CT default sniffing and the final batched warp.

    The level-by-level formulation paid ~10 eager dispatches per pyramid
    level (~12-45 ms each over a tunnelled device link; measured r3:
    0.2-0.7 s per level on programs whose compute is <50 ms) — this folds the
    case into a single dispatch.  Numerics are unchanged: the pyramid uses
    the same discrete-Gaussian kernels and the same separable-matmul regrid
    `resample` itself dispatches to for axis-aligned maps.
    """
    from platipy_tpu.core.interp import (
        affine_shear_resample,
        resample_separable,
    )
    from platipy_tpu.core import filters as _filters
    from platipy_tpu.core.resample import _linear_hmatrix_jnp

    pad_shape = tuple(int(v) for v in np.max(np.array(moving_shapes), axis=0))
    pad_size_xyz = (pad_shape[2], pad_shape[1], pad_shape[0])
    fixed_size_xyz = (fixed_shape[2], fixed_shape[1], fixed_shape[0])
    levels = len(shrinks)

    def grid_for(size_xyz, spacing_xyz, shrink):
        """smooth_and_resample's exact size/spacing formulas."""
        if not shrink or shrink == 1:
            shape = (size_xyz[2], size_xyz[1], size_xyz[0])
            return shape, tuple(spacing_xyz)
        new_size = [max(int(sz / float(shrink) + 0.5), 2) for sz in size_xyz]
        new_spacing = tuple(
            ((so - 1) * sp) / (sn - 1)
            for so, sp, sn in zip(size_xyz, spacing_xyz, new_size)
        )
        return (new_size[2], new_size[1], new_size[0]), new_spacing

    def kernels_for(sigma, spacing_xyz):
        if not sigma:
            return None
        var = sigma * sigma
        max_w = max(int(max(8 * var * sp for sp in spacing_xyz)), 2)
        return [
            _filters.discrete_gaussian_kernel1d(var / spacing_xyz[2] ** 2, 0.01, max_w),
            _filters.discrete_gaussian_kernel1d(var / spacing_xyz[1] ** 2, 0.01, max_w),
            _filters.discrete_gaussian_kernel1d(var / spacing_xyz[0] ** 2, 0.01, max_w),
        ]

    # static per-level metadata
    meta = []
    for shrink, sigma in zip(shrinks, sigmas):
        f_shape_l, f_spacing_l = grid_for(fixed_size_xyz, fixed_spacing, shrink)
        m_shape_l, m_spacing_l = grid_for(pad_size_xyz, moving_spacing, shrink)
        sy, sx = _sampling_strides(sampling_rate, f_shape_l)
        meta.append(dict(
            f_shape=f_shape_l, f_spacing=f_spacing_l,
            m_shape=m_shape_l, m_spacing=m_spacing_l,
            f_kernels=kernels_for(sigma, fixed_spacing),
            m_kernels=kernels_for(sigma, moving_spacing),
            f_maps=tuple((float(f_spacing_l[a] / fixed_spacing[a]), 0.0) for a in range(3)),
            m_maps=tuple((float(m_spacing_l[a] / moving_spacing[a]), 0.0) for a in range(3)),
            strides=(sy, sx),
            max_sp=float(max(f_spacing_l)),
        ))

    hp = jax.lax.Precision.HIGHEST

    def fn(f_arr, moving_arrs, opt_stack, initial_stack, scales_stacks,
           ref_i2p_lvls, mov_p2i_lvls, ref_i2p_full, mov_p2i_full):
        padded = []
        for m in moving_arrs:
            m = m.astype(jnp.float32)
            pads = [(0, t - s) for t, s in zip(pad_shape, m.shape)]
            if any(p[1] for p in pads):
                fill = (jnp.min(m) if sniff_default
                        else jnp.float32(static_default))
                m = jnp.pad(m, pads, constant_values=fill)
            padded.append(m)
        moving_stack = jnp.stack(padded)

        losses = None
        for level in range(levels):
            md = meta[level]
            f_lvl = f_arr.astype(jnp.float32)
            if md["f_kernels"] is not None:
                f_lvl = _filters.convolve_separable(f_lvl, md["f_kernels"])
            if md["f_shape"] != fixed_shape:
                f_lvl = resample_separable(f_lvl, md["f_maps"], md["f_shape"],
                                           interp=INTERP_LINEAR)
            sy, sx = md["strides"]
            f_sub = f_lvl[:, ::sy, ::sx]

            m_lvl = moving_stack
            if md["m_kernels"] is not None:
                m_lvl = _filters.convolve_separable(m_lvl, md["m_kernels"],
                                                    axes=(1, 2, 3))
            if md["m_shape"] != pad_shape:
                m_lvl = jax.vmap(
                    lambda a: resample_separable(a, md["m_maps"], md["m_shape"],
                                                 interp=INTERP_LINEAR)
                )(m_lvl)

            def call(t, init, m, scales, p2i):
                dummy = jnp.zeros((1, 1, 1), jnp.float32)
                return _register_level(
                    t, init, f_sub, m, dummy, dummy,
                    ref_i2p_lvls[level], p2i, scales,
                    jnp.float32(meta[level]["max_sp"]), jnp.float32(1.0),
                    metric_name=metric_name, optimiser=optimiser,
                    iterations=iterations, shape_zyx=f_sub.shape,
                    has_fmask=False, has_mmask=False,
                    convergence_window=convergence_window,
                )

            opt_stack, losses = jax.vmap(
                call, in_axes=(0, 0, 0, 0, 0)
            )(opt_stack, initial_stack, m_lvl, scales_stacks[level],
              mov_p2i_lvls[level])

        if interp_code != INTERP_LINEAR:
            # non-linear final interpolation runs outside this program (the
            # caller dispatches _cached_batched_final_warp on the stack)
            return moving_stack, opt_stack, losses

        if sniff_default:
            stack_min = jnp.min(moving_stack)
            default_value = jnp.where(stack_min <= -1000.0,
                                      jnp.float32(-1000.0), jnp.float32(0.0))
        else:
            default_value = jnp.float32(static_default)

        def warp_one(t, init, m, p2i):
            total = CompositeTransform([init, t])
            t_h = _linear_hmatrix_jnp(total).astype(jnp.float32)
            total_mat = jnp.matmul(
                jnp.matmul(p2i, t_h, precision=hp), ref_i2p_full, precision=hp
            )
            out, _ = affine_shear_resample(
                m, total_mat, fixed_shape, default_value=default_value
            )
            return out

        registered_stack = jax.vmap(warp_one, in_axes=(0, 0, 0, 0))(
            opt_stack, initial_stack, moving_stack, mov_p2i_full
        )
        return registered_stack, opt_stack, losses

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _cached_batched_level(metric_name, optimiser, iterations, shape_zyx,
                          convergence_window=0):
    """Module-cached jit(vmap(register_level)): a fresh jit-of-vmap closure
    per call re-traces the whole level program (~0.5s of Python) every case;
    caching by the static config makes steady-state calls pure dispatches."""
    run = functools.partial(
        _register_level,
        metric_name=metric_name, optimiser=optimiser, iterations=iterations,
        shape_zyx=shape_zyx, has_fmask=False, has_mmask=False,
        convergence_window=convergence_window,
    )

    def call(t, init, f_arr, m, scales, ref_i2p, mov_p2i, max_sp):
        dummy = jnp.zeros((1, 1, 1), jnp.float32)
        return run(t, init, f_arr, m, dummy, dummy, ref_i2p, mov_p2i, scales,
                   max_sp, jnp.float32(1.0))

    return jax.jit(
        jax.vmap(call, in_axes=(0, 0, None, 0, 0, None, 0, None))
    )


@functools.lru_cache(maxsize=None)
def _cached_batched_final_warp(shape_zyx, interp_code, default_value):
    """Module-cached jit(vmap) of the batched final warp (see
    _cached_batched_level for why: closure jits re-trace every call).

    Linear interpolation takes the gather-free shear path — these images feed
    the demons refinement or crop-box estimation, so the shear-warp
    interpolation cascade is acceptable (the public serial API keeps exact
    trilinear).  No runtime gather fallback: under vmap a lax.cond becomes a
    select executing BOTH branches, and registration affines are never near
    the degenerate (~90-degree) pivots.
    """
    from platipy_tpu.core.interp import affine_shear_resample
    from platipy_tpu.core.resample import _linear_hmatrix_jnp, _resample_linear_impl

    def warp_one(t, init, m, ref_i2p_full, mov_p2i_full):
        total = CompositeTransform([init, t])
        if interp_code == INTERP_LINEAR:
            t_h = _linear_hmatrix_jnp(total).astype(jnp.float32)
            hp = jax.lax.Precision.HIGHEST
            total_mat = jnp.matmul(
                jnp.matmul(mov_p2i_full, t_h, precision=hp), ref_i2p_full,
                precision=hp,
            )
            out, _ = affine_shear_resample(
                m.astype(jnp.float32), total_mat, shape_zyx,
                default_value=default_value,
            )
            return out
        return _resample_linear_impl(
            m, total, ref_i2p_full, mov_p2i_full,
            shape_zyx=shape_zyx, interp_code=interp_code,
            default_value=default_value, out_dtype_name="float32",
        )

    return jax.jit(jax.vmap(warp_one, in_axes=(0, 0, 0, None, 0)))
