"""Optimisers for parametric registration.

TPU-native equivalents of the ITK optimisers selected at reference
linear.py:206-230 and deformable.py:435-473: gradient descent, gradient
descent with line search, conjugate-gradient line search, and (bounded) LBFGS.

ITK estimates metric derivatives by sampled finite differences; here the
gradient comes from jax.grad through the resampler, and ITK's
``SetOptimizerScalesFromPhysicalShift`` (linear.py:158) becomes an explicit
per-parameter scaling computed from the transform Jacobian at fixed-image
sample points.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "physical_shift_scales",
    "optimise",
    "split_trainable",
    "windowed_loop",
]


def windowed_loop(one_step, carry0, iterations: int, window: int,
                  tolerance: float, done_fn=None):
    """Iterate ``one_step(carry) -> carry`` with optional convergence stop.

    ``carry[-1]`` must hold the current loss.  ``window == 0`` keeps an exact
    ``iterations`` trip count (fori_loop); otherwise the loop ends once the
    loss has stalled for ``window`` consecutive *effective* iterations
    (ITK v4 convergence-window semantics), with ``iterations`` the hard cap.

    Stall accounting: an iteration that leaves the loss exactly unchanged (a
    rejected step while the optimiser is still adapting its step size)
    neither increments nor resets the counter — counting rejections as
    stalls could end a level after W early overshoots with the transform
    completely unoptimised.  A step that changes the loss increments the
    counter when |relative change| <= tolerance and resets it otherwise.

    ``done_fn(carry) -> bool`` (optional, window > 0 only) adds an
    optimiser-specific termination test evaluated on the carry — the
    ITK-regular-step analogue of "step length collapsed" — so a lane parked
    at its optimum (every candidate step rejected, loss frozen) still ends
    the level instead of running to the hard cap.
    """
    if not window:
        return jax.lax.fori_loop(
            0, iterations, lambda _, c: one_step(c), carry0
        )
    W = int(window)
    tol = jnp.float32(tolerance)

    def cond(state):
        i, stall, carry = state
        alive = (i < iterations) & (stall < W)
        if done_fn is not None:
            alive = alive & jnp.logical_not(done_fn(carry))
        return alive

    def body(state):
        i, stall, carry = state
        new_carry = one_step(carry)
        v_prev, v_new = carry[-1], new_carry[-1]
        rel = jnp.abs(v_prev - v_new) / jnp.maximum(jnp.abs(v_prev), 1e-12)
        changed = v_new != v_prev
        stall = jnp.where(
            rel > tol, 0, jnp.where(changed, stall + 1, stall)
        )
        return i + 1, stall, new_carry

    _, _, carry = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), carry0)
    )
    return carry


def split_trainable(transform):
    """Partition a transform pytree into (trainable params dict, rebuild fn).

    Every array field except ``center`` is trainable (ITK keeps the centre
    fixed during optimisation).  For B-spline FFDs the control-point
    coefficients are the parameters.
    """
    if hasattr(transform, "coefficients"):  # BSplineTransform
        grid_origin = transform.grid_origin
        grid_spacing = transform.grid_spacing
        cls = type(transform)

        def rebuild_bspline(params):
            return cls(params["coefficients"], grid_origin, grid_spacing)

        return {"coefficients": transform.coefficients}, rebuild_bspline

    fields = [f.name for f in dataclasses.fields(transform)]
    trainable = {
        name: getattr(transform, name) for name in fields if name != "center"
    }
    frozen = {name: getattr(transform, name) for name in fields if name == "center"}

    def rebuild(params):
        return type(transform)(**params, **frozen)

    return trainable, rebuild


def physical_shift_scales(transform, sample_points: jnp.ndarray) -> dict:
    """Per-parameter scale = mean squared physical shift of the sample points
    under a unit change of that parameter (ITK ScalesFromPhysicalShift).

    Tiny computation (a jacobian at ~64 points) — pinned to the local CPU
    backend so it never pays remote-dispatch latency, and memoised by value
    (the eager jacfwd trace costs ~100ms and pipelines ask for the same
    transform/grid combination every case).
    """
    params0, _ = split_trainable(transform)
    key = (
        type(transform).__name__,
        tuple(sorted((k, np.asarray(v).tobytes()) for k, v in params0.items())),
        np.asarray(transform.center).tobytes() if hasattr(transform, "center") else b"",
        np.asarray(sample_points).tobytes(),
    )
    cached = _SCALES_CACHE.get(key)
    if cached is not None:
        return {k: np.array(v) for k, v in cached.items()}
    out = _physical_shift_scales_impl(transform, sample_points)
    out_np = {k: np.asarray(v) for k, v in out.items()}
    if len(_SCALES_CACHE) < 256:
        _SCALES_CACHE[key] = out_np
    return {k: np.array(v) for k, v in out_np.items()}


_SCALES_CACHE: dict = {}


def _physical_shift_scales_impl(transform, sample_points: jnp.ndarray) -> dict:
    params, rebuild = split_trainable(transform)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    def compute():
        pts = jnp.asarray(np.asarray(sample_points))

        def apply_fn(p):
            return rebuild(p).apply(pts)

        jac = jax.jacfwd(apply_fn)(params)  # pytree of [N, 3, *param_shape]
        scales = {}
        for name, j in jac.items():
            # mean over points of squared shift magnitude, per scalar parameter
            sq = jnp.sum(j * j, axis=1)  # [N, *param_shape]
            scales[name] = jnp.maximum(jnp.mean(sq, axis=0), 1e-10)
        return scales

    if cpu is not None:
        with jax.default_device(cpu):
            scales = compute()
        return {k: np.asarray(v) for k, v in scales.items()}
    return compute()


def _tree_scale(grad, scales):
    return {k: grad[k] / scales[k] for k in grad}


def optimise(
    loss_fn: Callable,
    transform,
    optimiser: str = "gradient_descent",
    learning_rate: float = 1.0,
    number_of_iterations: int = 50,
    scales: dict | None = None,
    max_step_physical: float = 1.0,
    verbose: bool = False,
    convergence_window: int = 0,
    convergence_tolerance: float = 1e-6,
):
    """Minimise ``loss_fn(transform) -> scalar`` over the transform parameters.

    Mirrors ITK GradientDescentOptimizerv4 semantics: the learning rate is
    estimated ONCE so the first scaled step moves sample points by about
    ``max_step_physical`` mm (ITK estimateLearningRate=Once default), then
    ``learning_rate`` multiplies that estimate.

    ``convergence_window`` > 0 stops the iterative optimisers (gradient
    descent, line search, cgls, lbfgs) early once the relative loss
    improvement stays below ``convergence_tolerance`` for that many
    consecutive effective iterations (ITK v4 convergence-window semantics;
    see :func:`windowed_loop` for the rejected-step accounting);
    ``number_of_iterations`` remains the hard cap.  0 (default) keeps the
    exact fixed trip count.

    Returns (optimised_transform, final_loss).
    """
    params, rebuild = split_trainable(transform)

    def loss_of_params(p):
        return loss_fn(rebuild(p))

    value_and_grad = jax.value_and_grad(loss_of_params)
    optimiser = optimiser.lower()

    def _estimated_lr(g):
        """lr such that the scaled step causes ~max_step_physical mm shift."""
        if scales is None:
            sq = sum(jnp.sum(gi * gi) for gi in jax.tree_util.tree_leaves(g))
        else:
            # step_i = g_i / scale_i; physical shift^2 ~= sum_i step_i^2*scale_i
            sq = sum(
                jnp.sum(g[k] * g[k] / scales[k]) for k in g
            )
        shift = jnp.sqrt(jnp.maximum(sq, 1e-20))
        return learning_rate * max_step_physical / shift

    def _loop(one_step, carry0, done_fn=None):
        return windowed_loop(
            one_step, carry0, number_of_iterations,
            convergence_window, convergence_tolerance, done_fn=done_fn,
        )

    if optimiser in ("gradient_descent", "cgls"):
        # monotone (regular-step) descent: reject steps that increase the
        # metric and halve the step; grow it gently on acceptance.  Strictly
        # more robust than ITK's fixed estimated-once learning rate on the
        # same landscapes.
        @jax.jit
        def run(p0):
            v0, g0 = value_and_grad(p0)
            lr0 = _estimated_lr(g0)

            def step(carry):
                p, lr, v = carry
                _, g = value_and_grad(p)
                if scales is not None:
                    g = _tree_scale(g, scales)
                cand = jax.tree_util.tree_map(lambda x, gi: x - lr * gi, p, g)
                v_cand = loss_of_params(cand)
                accept = v_cand < v
                p = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accept, a, b), cand, p
                )
                v = jnp.where(accept, v_cand, v)
                lr = jnp.where(accept, lr * 1.1, lr * 0.5)
                return p, lr, v

            # step length collapsed (ITK regular-step minStep analogue):
            # the lane is parked at its optimum rejecting every candidate
            p, _, v = _loop(step, (p0, lr0, v0),
                            done_fn=lambda c: c[1] < lr0 * 1e-5)
            return p, v

        p_opt, final = run(params)

    elif optimiser == "gradient_descent_line_search":
        @jax.jit
        def run(p0):
            v_init, g_init = value_and_grad(p0)
            lr0 = _estimated_lr(g_init)

            def body(carry):
                p, rej, _ = carry
                v, g = value_and_grad(p)
                if scales is not None:
                    g = _tree_scale(g, scales)

                def try_step(lr):
                    cand = jax.tree_util.tree_map(lambda x, gi: x - lr * gi, p, g)
                    return cand, loss_of_params(cand)

                # backtracking: halve lr until the loss decreases (8 tries)
                def ls_body(state):
                    lr, _, _, it = state
                    cand, vc = try_step(lr)
                    return lr * 0.5, cand, vc, it + 1

                def ls_cond(state):
                    lr, cand, vc, it = state
                    return (vc >= v) & (it < 8)

                cand0, v0 = try_step(lr0)
                lr, cand, vc, _ = jax.lax.while_loop(
                    ls_cond, ls_body, (lr0 * 0.5, cand0, v0, 0)
                )
                accept = vc < v
                p_new = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accept, a, b), cand, p
                )
                rej = jnp.where(accept, 0, rej + 1)
                return p_new, rej, jnp.where(accept, vc, v)

            # seed with the true initial loss so the convergence window sees
            # a valid previous value on iteration 1 (the fixed path ignores
            # the carried loss — body recomputes it — so this is behaviour-
            # identical when convergence_window == 0).  A rejected full line
            # search repeats deterministically (same p, same lr ladder), so
            # two consecutive rejections mean the lane is permanently stuck
            # at its optimum — end it rather than run to the hard cap.
            return _loop(body, (p0, jnp.int32(0), v_init),
                         done_fn=lambda c: c[1] >= 2)

        p_opt, _, final = run(params)

    elif optimiser in ("lbfgsb", "lbfgs", "lbfgs2"):
        # precondition by sqrt(scales) so rotation/translation parameters are
        # commensurate (ITK handles this through optimizer scales too)
        if scales is not None:
            sqrt_s = {k: np.sqrt(np.asarray(scales[k])) for k in scales}

            def to_q(p):
                return {k: p[k] * sqrt_s[k] for k in p}

            def from_q(q):
                return {k: q[k] / sqrt_s[k] for k in q}
        else:
            to_q = from_q = lambda x: x

        def loss_q(q):
            return loss_of_params(from_q(q))

        vg_q = jax.value_and_grad(loss_q)
        opt = optax.lbfgs()

        @jax.jit
        def run(p0):
            q0 = to_q(p0)
            state0 = opt.init(q0)
            v0, g0 = vg_q(q0)

            # best-iterate safeguard: optax.lbfgs's zoom linesearch can fail
            # on ill-conditioned FFD landscapes and run away (observed: the
            # same registration converging or exploding depending on XLA:CPU
            # thread partitioning).  Track the best (finite) iterate and
            # return THAT — a diverged tail then wastes iterations instead of
            # corrupting the result, matching ITK's monotone safeguards.
            def body(carry):
                q, state, g, best_q, best_v, v = carry
                updates, state = opt.update(
                    g, state, q, value=v, grad=g, value_fn=loss_q
                )
                q = optax.apply_updates(q, updates)
                v, g = vg_q(q)
                better = jnp.isfinite(v) & (v < best_v)
                best_q = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(better, a, b), q, best_q
                )
                best_v = jnp.where(better, v, best_v)
                return q, state, g, best_q, best_v, v

            carry = _loop(body, (q0, state0, g0, q0, v0, v0),
                          done_fn=lambda c: jnp.logical_not(jnp.isfinite(c[-1])))
            _, _, _, best_q, best_v, _ = carry
            return from_q(best_q), best_v

        p_opt, final = run(params)

    elif optimiser == "exhaustive":
        # coarse grid sweep around the initial parameters (reference
        # linear.py:215-222 marks this as not recommended; provided for parity)
        best_p, best_v = params, loss_of_params(params)
        flat, treedef = jax.tree_util.tree_flatten(params)
        for i, leaf in enumerate(flat):
            for delta in (-0.1, 0.1, -0.05, 0.05):
                cand_flat = list(flat)
                cand_flat[i] = leaf + delta
                cand = jax.tree_util.tree_unflatten(treedef, cand_flat)
                v = loss_of_params(cand)
                if float(v) < float(best_v):
                    best_p, best_v = cand, v
        p_opt, final = best_p, best_v

    else:
        raise ValueError(f"Unknown optimiser {optimiser!r}")

    return rebuild(p_opt), float(final)
