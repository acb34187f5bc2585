"""North-star benchmark: 10-atlas multi-atlas segmentation (register + fuse).

Runs the full pipeline — auto-crop registrations, per-atlas affine, batched
multiscale demons (6/3/1.5 mm, 150/125/100 iterations), fusion, post-processing
— on synthetic pseudo-CT at realistic cardiac-crop resolution, on whatever
accelerator JAX finds (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
vs_baseline is relative to the reference's published ~300 s end-to-end hybrid
cardiac time on a 24-core i9 + RTX 3090 (platipy cardiac README:42-46); the
north-star target is <60 s (BASELINE.md).
"""

import copy
import json
import time

import numpy as np


def build_case(center, radius, shape, spacing, rng=None):
    import jax.numpy as jnp

    from platipy_tpu.core.image import from_array

    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    d = np.sqrt(
        ((xx - center[2]) * spacing[0]) ** 2
        + ((yy - center[1]) * spacing[1]) ** 2
        + ((zz - center[0]) * spacing[2]) ** 2
    )
    r_mm = radius * spacing[0]
    img = -1000 + 1040 / (1 + np.exp((d - r_mm) / 2.0))
    # add some internal structure so registration has texture to work with
    if rng is not None:
        img = img + 30 * np.sin(xx / 9.0) * np.cos(yy / 7.5) * (d < r_mm)
    mask = (d <= r_mm).astype(np.uint8)
    return (
        from_array(img.astype(np.float32), spacing=spacing),
        from_array(mask, spacing=spacing),
    )


def main():
    t_start = time.time()
    import os

    import jax

    # persistent compilation cache: compiles amortise across runs, as they
    # would in a deployed segmentation service
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from platipy_tpu.label.comparison import compute_metric_dsc
    from platipy_tpu.projects.multiatlas.run import (
        MUTLIATLAS_SETTINGS_DEFAULTS,
        run_segmentation,
    )

    n_atlases = 10
    shape = (96, 160, 160)       # cardiac crop, [z,y,x]
    spacing = (1.5, 1.5, 2.0)    # (x,y,z) mm

    rng = np.random.RandomState(7)
    target_img, target_mask = build_case((48, 80, 80), 36, shape, spacing, rng)

    atlas_set = {}
    for i in range(n_atlases):
        jitter = rng.randint(-4, 5, size=3)
        r_jit = 36 + rng.randint(-4, 5)
        img, mask = build_case(
            (48 + jitter[0], 80 + jitter[1], 80 + jitter[2]), r_jit, shape, spacing, rng
        )
        atlas_set[f"{i:02d}"] = {"CT Image": img, "WHOLEHEART": mask}

    settings = copy.deepcopy(MUTLIATLAS_SETTINGS_DEFAULTS)
    settings["atlas_settings"]["atlas_set"] = atlas_set
    settings["atlas_settings"]["atlas_id_list"] = list(atlas_set.keys())
    settings["atlas_settings"]["atlas_structure_list"] = ["WHOLEHEART"]
    # the reference multiatlas defaults (run.py:75-91): 6/3/1.5mm, 150/125/100
    settings["deformable_registration_settings"]["resolution_staging"] = [6, 3, 1.5]
    settings["deformable_registration_settings"]["iteration_staging"] = [150, 125, 100]
    settings["label_fusion_settings"]["vote_type"] = "unweighted"
    settings["postprocessing_settings"]["structures_for_binaryfillhole"] = ["WHOLEHEART"]

    # run 1 (cold: includes jit compilation / cache population)
    t0 = time.time()
    results, _ = run_segmentation(target_img, settings)
    np.asarray(results["WHOLEHEART"].array)  # force full execution
    cold_s = time.time() - t0
    dsc = compute_metric_dsc(target_mask, results["WHOLEHEART"])

    # steady state: three distinct warm cases back-to-back (deployed-service
    # regime); the mean damps single-run tunnel/host jitter
    warm_times = []
    dscs = [float(dsc)]
    for case_args in (((46, 82, 78), 34), ((50, 78, 82), 37), ((47, 80, 79), 35)):
        target_img_w, target_mask_w = build_case(
            case_args[0], case_args[1], shape, spacing, rng
        )
        t0 = time.time()
        results_w, _ = run_segmentation(target_img_w, settings)
        np.asarray(results_w["WHOLEHEART"].array)  # force full execution
        warm_times.append(time.time() - t0)
        dscs.append(float(compute_metric_dsc(target_mask_w, results_w["WHOLEHEART"])))

    warm_s = float(np.mean(warm_times))
    baseline_s = 300.0  # reference hybrid cardiac pipeline ~5 min per case
    print(
        json.dumps(
            {
                "metric": "multiatlas_10atlas_register_fuse_per_case",
                "value": round(warm_s, 2),
                "unit": "s",
                "vs_baseline": round(warm_s / baseline_s, 4),
                "cold_s": round(cold_s, 2),
                "warm_runs_s": [round(t, 2) for t in warm_times],
                "throughput_cases_per_hour": round(3600.0 / warm_s, 1),
                "dsc": round(min(dscs), 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
