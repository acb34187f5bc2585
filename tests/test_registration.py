"""Registration engine tests: recover known transforms on synthetic volumes.

Mirrors the reference's synthetic-sphere E2E strategy
(platipy/imaging/tests/test_cardiac.py:35-142) at unit scale.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.core.resample import warp_image
from platipy_tpu.core.transform import TranslationTransform
from platipy_tpu.registration.deformable import (
    fast_symmetric_forces_demons_registration,
    multiscale_demons,
)
from platipy_tpu.registration.linear import alignment_registration, linear_registration


def _sphere(shape=(32, 48, 48), center=(16, 24, 24), r=10, spacing=(1.5, 1.5, 2.5),
            inside=0.0, outside=-1000.0, soft=True):
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    d = np.sqrt(
        ((xx - center[2]) * spacing[0]) ** 2
        + ((yy - center[1]) * spacing[1]) ** 2
        + ((zz - center[0]) * spacing[2]) ** 2
    )
    r_mm = r * spacing[0]
    if soft:
        arr = outside + (inside - outside) / (1 + np.exp((d - r_mm) / 2.0))
    else:
        arr = np.where(d <= r_mm, inside, outside).astype(np.float32)
    return from_array(arr.astype(np.float32), spacing=spacing)


def _dsc(a, b):
    a = np.asarray(a) > 0.5
    b = np.asarray(b) > 0.5
    return 2 * (a & b).sum() / max(a.sum() + b.sum(), 1)


def test_alignment_registration_recovers_shift():
    fixed = _sphere(center=(16, 24, 24), inside=1000.0, outside=0.0)
    moving = _sphere(center=(16, 24, 30), inside=1000.0, outside=0.0)
    aligned, tfm = alignment_registration(fixed, moving, moments=True)
    # COM difference: 6 voxels * 1.5mm = 9mm in +x
    np.testing.assert_allclose(np.asarray(tfm.translation), [9.0, 0, 0], atol=0.5)
    mask_f = np.asarray(fixed.array) > 500
    mask_a = np.asarray(aligned.array) > 500
    assert _dsc(mask_f, mask_a) > 0.95


@pytest.mark.parametrize("optimiser", ["gradient_descent", "lbfgsb"])
def test_linear_registration_rigid_shift(optimiser):
    fixed = _sphere(center=(16, 24, 24))
    moving = _sphere(center=(18, 26, 27))
    registered, tfm = linear_registration(
        fixed,
        moving,
        reg_method="rigid",
        metric="mean_squares",
        optimiser=optimiser,
        shrink_factors=[4, 2],
        smooth_sigmas=[2, 0],
        number_of_iterations=30,
    )
    mask_f = np.asarray(fixed.array) > -500
    mask_r = np.asarray(registered.array) > -500
    assert _dsc(mask_f, mask_r) > 0.9
    # default value auto-detected as CT-like
    assert np.asarray(registered.array).min() <= -900


def test_linear_registration_similarity_scale():
    fixed = _sphere(r=12)
    moving = _sphere(r=9)
    registered, tfm = linear_registration(
        fixed,
        moving,
        reg_method="similarity",
        metric="mean_squares",
        optimiser="gradient_descent",
        shrink_factors=[4, 2],
        smooth_sigmas=[2, 0],
        number_of_iterations=40,
    )
    mask_f = np.asarray(fixed.array) > -500
    mask_r = np.asarray(registered.array) > -500
    d0 = _dsc(mask_f, np.asarray(moving.array) > -500)
    d1 = _dsc(mask_f, mask_r)
    assert d1 > d0  # improved
    assert d1 > 0.93


def test_linear_registration_correlation_metric():
    fixed = _sphere(center=(16, 24, 24))
    # moving has different intensity scaling: correlation should still work
    moving = _sphere(center=(16, 24, 28))
    moving = moving.with_array(moving.array * 0.5 + 100.0)
    registered, tfm = linear_registration(
        fixed,
        moving,
        reg_method="translation",
        metric="correlation",
        optimiser="gradient_descent",
        shrink_factors=[4, 2],
        smooth_sigmas=[2, 0],
        number_of_iterations=30,
        default_value=-400.0,
    )
    # recovered translation should be ~[6, 0, 0] mm (4 voxels * 1.5mm)
    opt_t = np.asarray(tfm.transforms[1].translation)
    np.testing.assert_allclose(opt_t, [6.0, 0.0, 0.0], atol=0.5)
    mask_f = np.asarray(fixed.array) > -500
    # equivalent threshold on the rescaled intensities: 0.5*(-500)+100
    mask_r = np.asarray(registered.array) > -150.0
    assert _dsc(mask_f, mask_r) > 0.95


def test_demons_recovers_local_deformation():
    fixed = _sphere(r=11)
    moving = _sphere(r=9)
    registered, tfm, dvf = fast_symmetric_forces_demons_registration(
        fixed,
        moving,
        resolution_staging=[4, 2],
        iteration_staging=[15, 15],
        isotropic_resample=True,
        regularisation_kernel_mm=1.5,
    )
    mask_f = np.asarray(fixed.array) > -500
    d0 = _dsc(mask_f, np.asarray(moving.array) > -500)
    d1 = _dsc(mask_f, np.asarray(registered.array) > -500)
    assert d1 > d0
    assert d1 > 0.97
    # dvf on fixed grid with 3 components
    assert dvf.array.shape == fixed.array.shape + (3,)


def test_demons_dvf_transform_propagates_structure():
    fixed = _sphere(r=11, soft=False, inside=1.0, outside=-1000.0)
    moving = _sphere(r=9, soft=False, inside=1.0, outside=-1000.0)
    _, tfm, dvf = fast_symmetric_forces_demons_registration(
        fixed, moving,
        resolution_staging=[4, 2],
        iteration_staging=[15, 15],
        isotropic_resample=True,
    )
    # propagate a binary structure through the DVF (as label propagation does)
    struct = moving.with_array((np.asarray(moving.array) > 0).astype(np.uint8))
    warped = warp_image(struct.astype(jnp.float32), dvf, reference=fixed,
                        interp="nearest", default_value=0.0)
    fixed_struct = np.asarray(fixed.array) > 0
    assert _dsc(fixed_struct, np.asarray(warped.array)) > 0.9


def test_batched_convergence_window_matches_fixed_iterations():
    """Early-stopped batched registration lands on the same optimum as the
    fixed-trip-count loop (the window only trims post-convergence iterations)."""
    from platipy_tpu.registration.linear import linear_registration_batched

    base = np.zeros((24, 36, 36), np.float32) - 1000
    zz, yy, xx = np.mgrid[:24, :36, :36]
    base += 1100 * ((((zz - 12) / 8.0) ** 2 + ((yy - 18) / 10.0) ** 2
                     + ((xx - 18) / 10.0) ** 2) < 1)
    fixed = from_array(base, spacing=(2.0, 2.0, 3.0))
    mov = np.roll(base, (0, 3, 4), axis=(0, 1, 2)).astype(np.float32)
    movings = [from_array(mov, spacing=(2.0, 2.0, 3.0))] * 2

    outs = {}
    for cw in (0, 5):
        regs, _ = linear_registration_batched(
            fixed, movings, reg_method="rigid", metric="mean_squares",
            optimiser="gradient_descent_line_search", shrink_factors=[4, 2],
            smooth_sigmas=[0, 0], sampling_rate=1.0, number_of_iterations=30,
            convergence_window=cw,
        )
        outs[cw] = np.asarray(regs[0].array)
    err_fixed = np.abs(outs[0] - base).mean()
    err_early = np.abs(outs[5] - base).mean()
    assert err_early <= err_fixed + 1.0  # same optimum (small residual jitter)
    assert err_early < 15.0  # and the registration genuinely converged


def test_windowed_loop_rejected_steps_do_not_stall():
    """A run of step-rejections (loss unchanged while the optimiser halves
    its learning rate) must not trip the convergence window: only effective
    iterations (loss changed, |rel| <= tol) count toward the stall window."""
    import jax

    from platipy_tpu.registration.optimise import windowed_loop

    # carry = (i, loss): the first 6 "iterations" reject (loss unchanged),
    # then each step improves the loss by 10% until it converges.
    def one_step(carry):
        i, v = carry
        v_new = jnp.where(i < 6, v, v * 0.9)
        return i + 1, v_new

    _, v_final = jax.jit(
        lambda c: windowed_loop(one_step, c, 40, 3, 1e-6)
    )((jnp.int32(0), jnp.float32(100.0)))
    # with the buggy accounting the loop exits after 3 rejections at v=100;
    # correct accounting reaches the improvement phase and descends
    assert float(v_final) < 10.0

    # and genuine stalls still stop early: constant tiny improvement below
    # tolerance for `window` consecutive iterations ends the loop
    def tiny_step(carry):
        i, v = carry
        # representable change (float32) well below the 1e-6 tolerance
        return i + 1, v * (1.0 - 2e-7)

    i_final, _ = jax.jit(
        lambda c: windowed_loop(tiny_step, c, 1000, 3, 1e-6)
    )((jnp.int32(0), jnp.float32(1.0)))
    assert int(i_final) <= 5

    # a lane parked at its optimum (every step rejected, loss frozen, lr
    # halving) must still terminate via done_fn instead of the hard cap
    def reject_step(carry):
        i, lr, v = carry
        return i + 1, lr * 0.5, v

    i_done, _, _ = jax.jit(
        lambda c: windowed_loop(reject_step, c, 1000, 3, 1e-6,
                                done_fn=lambda c: c[1] < 1e-5)
    )((jnp.int32(0), jnp.float32(1.0), jnp.float32(42.0)))
    assert int(i_done) < 25


def test_optimise_lbfgs_honours_convergence_window():
    """convergence_window now applies to the lbfgs loop too (it was silently
    ignored): early-stopped lbfgs matches the fixed-trip-count optimum."""
    from platipy_tpu.core.transform import TranslationTransform as _T
    from platipy_tpu.registration.optimise import optimise

    target = jnp.asarray([3.0, -2.0, 1.0], jnp.float32)

    def loss_fn(tfm):
        return jnp.sum((tfm.translation - target) ** 2)

    t0 = _T(translation=jnp.zeros(3, jnp.float32))
    t_fixed, v_fixed = optimise(loss_fn, t0, optimiser="lbfgs",
                                number_of_iterations=50)
    t_early, v_early = optimise(loss_fn, t0, optimiser="lbfgs",
                                number_of_iterations=50,
                                convergence_window=5)
    assert v_early < 1e-4
    assert abs(v_early - v_fixed) < 1e-4
    np.testing.assert_allclose(np.asarray(t_early.translation),
                               np.asarray(t_fixed.translation), atol=1e-3)


def test_demons_rms_convergence_stop():
    """maximum_rms_error reproduces ITK's PDE-framework per-level stop: a
    huge threshold stops after one iteration, threshold 0 never stops (bit-
    identical to the fixed-trip-count fori path), and the reference-default
    0.99 mm still registers the spheres."""
    from platipy_tpu.registration.deformable import demons_level

    fixed = _sphere(r=11)
    moving = _sphere(r=9)

    full = demons_level(fixed, moving, iterations=12)
    one = demons_level(fixed, moving, iterations=1)
    big = demons_level(fixed, moving, iterations=12, maximum_rms_error=1e6)
    np.testing.assert_allclose(np.asarray(big.array), np.asarray(one.array),
                               atol=1e-6)
    zero = demons_level(fixed, moving, iterations=12, maximum_rms_error=0.0)
    np.testing.assert_allclose(np.asarray(zero.array), np.asarray(full.array),
                               atol=1e-6)

    registered, _, _ = fast_symmetric_forces_demons_registration(
        fixed, moving, resolution_staging=[4, 2], iteration_staging=[15, 15],
        isotropic_resample=True, regularisation_kernel_mm=1.5,
        maximum_rms_error=0.99,
    )
    mask_f = np.asarray(fixed.array) > -500
    d1 = _dsc(mask_f, np.asarray(registered.array) > -500)
    assert d1 > 0.95


def test_batched_demons_rms_stop_matches_quality():
    """The batched demons path accepts maximum_rms_error and still recovers
    the deformation (wall-clock drops; quality within tolerance)."""
    import jax.numpy as jnp

    from platipy_tpu.parallel.atlas import batched_multiscale_demons
    from platipy_tpu.core.resample import warp_image

    fixed = _sphere(r=11)
    moving = _sphere(r=9)
    moving_stack = jnp.stack([moving.array.astype(jnp.float32)] * 2)
    dvfs = batched_multiscale_demons(
        fixed.array.astype(jnp.float32), moving_stack,
        spacing_xyz=fixed.spacing, resolution_staging=[4, 2],
        iteration_staging=[15, 15], smoothing_sigmas=[4, 2],
        isotropic_resample=True, maximum_rms_error=0.99,
    )
    dvf0 = fixed.with_array(dvfs[0])
    warped = warp_image(moving, dvf0, reference=fixed, interp="linear",
                        default_value=-1000.0)
    mask_f = np.asarray(fixed.array) > -500
    d1 = _dsc(mask_f, np.asarray(warped.array) > -500)
    d0 = _dsc(mask_f, np.asarray(moving.array) > -500)
    assert d1 > d0
    assert d1 > 0.95


def test_batched_demons_bf16_field_storage_matches_f32():
    """field_dtype="bfloat16" stores the demons field/update chain in bf16
    (an HBM-bandwidth lever on TPU); the recovered warp must match the f32
    run to sub-voxel tolerance and the registration quality bar."""
    import jax.numpy as jnp

    from platipy_tpu.core.resample import warp_image
    from platipy_tpu.parallel.atlas import batched_multiscale_demons

    fixed = _sphere(r=11)
    moving = _sphere(r=9)
    moving_stack = jnp.stack([moving.array.astype(jnp.float32)] * 2)
    kwargs = dict(
        spacing_xyz=fixed.spacing, resolution_staging=[4, 2],
        iteration_staging=[10, 10], smoothing_sigmas=[4, 2],
        isotropic_resample=True,
    )
    dvf_f32 = batched_multiscale_demons(
        fixed.array.astype(jnp.float32), moving_stack, **kwargs)
    dvf_bf16 = batched_multiscale_demons(
        fixed.array.astype(jnp.float32), moving_stack,
        field_dtype="bfloat16", **kwargs)
    assert dvf_bf16.dtype == jnp.float32  # returned field is regridded f32
    # fields agree to well under a voxel (spacing >= 1 mm here)
    diff = np.abs(np.asarray(dvf_f32) - np.asarray(dvf_bf16))
    assert float(np.mean(diff)) < 0.05
    assert float(np.max(diff)) < 1.0
    warped = warp_image(moving, fixed.with_array(dvf_bf16[0]),
                        reference=fixed, interp="linear",
                        default_value=-1000.0)
    mask_f = np.asarray(fixed.array) > -500
    assert _dsc(mask_f, np.asarray(warped.array) > -500) > 0.95

