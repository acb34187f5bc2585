"""Kernel micro-benchmarks: per-kernel wall times on the attached device.

Times the hot device kernels at bench-like shapes (one JSON line per
kernel: name, shape, median seconds over reps, effective GB/s where a
traffic model exists).  Maintained utility — run after kernel changes to
catch per-kernel regressions without a full pipeline run.

Usage: python tools/bench_kernels.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    def timed(fn, *args):
        out = fn(*args)
        float(jnp.max(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            float(jnp.max(jnp.asarray(
                jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32)))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    SHAPE = (96, 160, 160)
    SPACING = (1.5, 1.5, 2.0)
    vol = jnp.asarray(rng.rand(*SHAPE).astype(np.float32) * 1000 - 500)
    vol_bytes = float(np.prod(SHAPE)) * 4
    # anatomically-shaped masks (smooth blobs), not random noise: the CC /
    # contour kernels' propagation rounds are geometry-dependent and the
    # pipeline's inputs are smooth warped structures
    smooth = gaussian_filter(rng.rand(*SHAPE).astype(np.float32), 8)
    mask = (smooth > np.percentile(smooth, 80)).astype(np.uint8)
    stack10 = jnp.asarray(
        rng.rand(10, *SHAPE).astype(np.float32) * 1000 - 500)
    mask_stack = jnp.asarray(np.stack([
        (gaussian_filter(rng.rand(*SHAPE).astype(np.float32), 8)
         > np.percentile(smooth, 80)).astype(np.float32)
        for _ in range(10)
    ]))
    results = []

    def rec(name, secs, traffic_bytes=None, note=""):
        row = {"kernel": name, "median_s": round(secs, 4)}
        if traffic_bytes:
            row["eff_gbps"] = round(traffic_bytes / secs / 1e9, 1)
        if note:
            row["note"] = note
        results.append(row)
        print(json.dumps(row), flush=True)

    # separable Gaussian (3-pass MXU banded matmul)
    from platipy_tpu.core import filters as F

    kernels = [F.discrete_gaussian_kernel1d(4.0, 0.01, 32)] * 3
    rec("gaussian_separable_sigma2vox",
        timed(lambda v: F.convolve_separable(v, kernels), vol),
        traffic_bytes=6 * vol_bytes, note="~2 pass/axis traffic model")

    # signed EDT
    from platipy_tpu.core.distance import signed_maurer_distance_map

    from platipy_tpu.core.image import from_array as _fa
    mask_img = _fa(mask, spacing=SPACING)
    rec("signed_maurer_edt",
        timed(lambda m: signed_maurer_distance_map(m), mask_img))

    # morphology closing
    from platipy_tpu.core.morphology import binary_closing_batched

    rec("binary_closing_batched_s2", timed(
        lambda s: binary_closing_batched(s, (2, 2, 2)),
        jnp.asarray(np.stack([mask, mask]))))

    # fill + largest (segmented-scan kernel), 10 lanes
    from platipy_tpu.core.components import (
        fill_and_largest_component_stack_device,
        keep_largest_component_stack_device,
    )

    rec("fill_and_largest_stack10",
        timed(fill_and_largest_component_stack_device, mask_stack))
    rec("keep_largest_stack10",
        timed(keep_largest_component_stack_device, mask_stack))

    # IAR contour chain (threshold -> fill -> largest -> contour -> pack)
    from platipy_tpu.label.iar import _contours_packed_jit

    rec("iar_contours_packed_stack10", timed(
        lambda s: _contours_packed_jit(s, jnp.full((10,), 0.1, jnp.float32)),
        mask_stack))

    # batched DVF warp (10 lanes)
    from platipy_tpu.parallel.atlas import batched_warp_by_dvf

    dvf = jnp.asarray(rng.randn(10, *SHAPE, 3).astype(np.float32) * 3)
    rec("batched_warp_by_dvf_10", timed(
        lambda s, d: batched_warp_by_dvf(s, d, SPACING), stack10, dvf),
        traffic_bytes=10 * vol_bytes * 7.5, note="multipass warp model")

    # one demons fine-level iteration x30, chunked vs full
    import functools

    from platipy_tpu.registration.deformable import _demons_level_impl

    def pde(s):
        ss = np.repeat(np.asarray(s, np.float64).reshape(-1), 3)[:3]
        return tuple(tuple(float(v) for v in F.discrete_gaussian_kernel1d(
            ss[k] ** 2, 0.1, 30)) for k in (2, 1, 0))

    lvl = (128, 160, 160)
    fixed_l = jnp.asarray(rng.rand(*lvl).astype(np.float32) * 100)
    moving_l = jnp.asarray(rng.rand(10, *lvl).astype(np.float32) * 100)
    zf = jnp.zeros(lvl + (3,), jnp.float32)
    d30 = functools.partial(
        _demons_level_impl, iterations=30, spacing=(1.5, 1.5, 1.5),
        std_kernels_key=pde(1.0), update_kernels_key=pde(1.0),
        max_step_vox=0.5, max_disp_vox=(4, 4, 4), warp_dtype_key="bfloat16")
    prog = jax.jit(lambda fx, mv: jax.vmap(lambda m: d30(fx, m, zf))(mv))
    t_full = timed(prog, fixed_l, moving_l)
    t_chunk = timed(lambda fx, mv: [prog(fx, mv[:5]), prog(fx, mv[5:])][-1],
                    fixed_l, moving_l)
    lvl_bytes = float(np.prod(lvl)) * 4
    rec("demons_30it_10atlas_full", t_full,
        traffic_bytes=30 * 54.5 * lvl_bytes * 10, note="ROOFLINE traffic model")
    rec("demons_30it_10atlas_chunk5", t_chunk,
        traffic_bytes=30 * 54.5 * lvl_bytes * 10)

    # nearest-point distance query (IAR)
    from platipy_tpu.core.distance import min_distance_to_point_sets

    q = rng.rand(20000, 3).astype(np.float32) * 200
    sets = [rng.rand(15000, 3).astype(np.float32) * 200 for _ in range(10)]
    rec("min_dist_20k_x10x15k", timed(
        lambda: min_distance_to_point_sets(q, sets)))

    print(json.dumps({"kernel": "_summary", "device": str(jax.devices()[0]),
                      "n": len(results)}))


if __name__ == "__main__":
    main()
