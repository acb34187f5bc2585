"""VERDICT r4 item 7: can a software-pipelined demons formulation beat the
measured ~450 GB/s effective rate?

Hypothesis under test: splitting the atlas batch in two and interleaving the
two halves' serial smooth chains inside one program exposes overlap that the
single vmapped batch misses.

TPU execution model context: one core executes ONE op at a time (no
concurrent kernels/streams); a [10,z,y,x] batched op already fills the chip,
so inter-op overlap can only help if individual ops UNDERUTILISE the chip
(tiny coarse-level grids).  This probe measures, at the bench's fine-level
shape:
  (a) t_full:        vmap over the full batch of 10 (current formulation)
  (b) t_interleave:  one program alternating half-batch A / half-batch B
                     iterations (two independent 5-lane chains)
  (c) 2 x t_half:    two sequential 5-lane programs (no pipelining at all)
plus multi-arity stream rates (copy / saxpy / triad) to locate the machine's
actual achievable HBM rate vs the 819 GB/s nameplate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from platipy_tpu.core import filters as F
    from platipy_tpu.registration.deformable import _demons_level_impl

    lvl_shape = (128, 160, 160)
    lvl_spacing = (1.5, 1.5, 1.5)
    reg_kernel_vox = tuple((1.5 / np.array([1.5, 1.5, 2.0])).tolist())

    def pde_kernels(sig_vox):
        s = np.asarray(sig_vox, dtype=np.float64).reshape(-1)
        if s.size == 1:
            s = np.repeat(s, 3)
        return tuple(
            tuple(float(v) for v in F.discrete_gaussian_kernel1d(s[k] ** 2, 0.1, 30))
            for k in (2, 1, 0)
        )

    rng = np.random.RandomState(0)
    fixed = jnp.asarray(rng.rand(*lvl_shape).astype(np.float32)) * 100
    moving = jnp.asarray(rng.rand(10, *lvl_shape).astype(np.float32)) * 100
    zero_field = jnp.zeros(lvl_shape + (3,), jnp.float32)

    def demons(iters):
        return functools.partial(
            _demons_level_impl, iterations=iters, spacing=lvl_spacing,
            std_kernels_key=pde_kernels(reg_kernel_vox),
            update_kernels_key=pde_kernels((1.0, 1.0, 1.0)),
            max_step_vox=0.5, max_disp_vox=(4, 4, 4),
            warp_dtype_key="bfloat16",
        )

    def timed(fn, *args, reps=2):
        out = fn(*args)
        float(jnp.max(jax.tree_util.tree_leaves(out)[0]))  # warm + sync
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            float(jnp.max(jax.tree_util.tree_leaves(out)[0]))
            best = min(best, time.time() - t0)
        return best

    ITERS = 30

    # (a) full batch, one vmapped program
    full = jax.jit(lambda fx, mv: jax.vmap(
        lambda m: demons(ITERS)(fx, m, zero_field))(mv))
    t_full = timed(full, fixed, moving)

    # (c) two sequential half-batch programs
    half = jax.jit(lambda fx, mv: jax.vmap(
        lambda m: demons(ITERS)(fx, m, zero_field))(mv))
    tA = timed(half, fixed, moving[:5])
    tB = timed(half, fixed, moving[5:])

    # (b) one program, interleaved half-batches: each fori_loop step advances
    # BOTH half-chains by one demons iteration (two independent 5-lane
    # dependency chains visible to the scheduler)
    one_iter = demons(1)

    @jax.jit
    def interleaved(fx, mvA, mvB):
        fA = jnp.zeros((5,) + lvl_shape + (3,), jnp.float32)
        fB = jnp.zeros((5,) + lvl_shape + (3,), jnp.float32)

        def body(_, state):
            fA, fB = state
            fA = jax.vmap(lambda m, f: one_iter(fx, m, f))(mvA, fA)
            fB = jax.vmap(lambda m, f: one_iter(fx, m, f))(mvB, fB)
            return fA, fB

        return jax.lax.fori_loop(0, ITERS, body, (fA, fB))

    t_inter = timed(interleaved, fixed, moving[:5], moving[5:])

    # multi-arity stream rates (read r + write 1 per element)
    n = 64 * 1024 * 1024
    iters = 50
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones((n,), jnp.float32)
    z = jnp.full((n,), 0.5, jnp.float32)

    @jax.jit
    def copy_chain(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: v * 1.0000001, x)

    @jax.jit
    def saxpy_chain(x, z):
        return jax.lax.fori_loop(0, iters, lambda i, v: v + 0.5 * z, x)

    @jax.jit
    def triad_chain(x, y, z):
        return jax.lax.fori_loop(0, iters, lambda i, v: y + v * z, x)

    def stream(fn, nread, *args):
        out = fn(*args)
        float(jnp.sum(out[:1]))
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out[:1]))
        dt = time.time() - t0
        return iters * (nread + 1) * n * 4 / dt / 1e9

    bw_copy = stream(copy_chain, 1, x)
    bw_saxpy = stream(saxpy_chain, 2, x, z)
    bw_triad = stream(triad_chain, 3, x, y, z)

    print(f"t_full(10)      = {t_full:.3f}s")
    print(f"t_half(5) x 2   = {tA + tB:.3f}s  ({tA:.3f} + {tB:.3f})")
    print(f"t_interleaved   = {t_inter:.3f}s")
    print(f"speedup interleave vs full: {t_full / t_inter:.3f}x")
    print(f"stream copy  (r1w1): {bw_copy:.1f} GB/s")
    print(f"stream saxpy (r2w1): {bw_saxpy:.1f} GB/s")
    print(f"stream triad (r3w1): {bw_triad:.1f} GB/s")


if __name__ == "__main__":
    main()
