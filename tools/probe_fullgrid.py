"""Diagnostic: full-FOV (512x512x192) cardiac case with stage attribution.

Reproduces bench.py's clinical-scale case, runs it warm with
PLATIPY_TPU_PROFILE=1, and reports: per-stage seconds, the auto-crop box,
VESSEL surface metrics, and where the vessel truncates (z-extent of the
prediction vs ground truth).  Pure diagnostics — not part of the bench.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = os.path.join(repo, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s %(message)s")
    for noisy in ("jax", "jax._src"):
        logging.getLogger(noisy).setLevel(logging.WARNING)

    rng = np.random.RandomState(7)
    ct0, masks0, fields0 = bench.build_phantom()
    atlas_set = {}
    for i in range(10):
        ct_i, masks_i = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        dz, dy, dx = rng.randint(0, 5, size=3)
        crop = ((dz, bench.SHAPE[0] - rng.randint(0, 5)),
                (dy, bench.SHAPE[1] - rng.randint(0, 5)),
                (dx, bench.SHAPE[2] - rng.randint(0, 5)))
        img, m = bench.to_images(ct_i, masks_i, crop=crop)
        atlas_set[f"{i:02d}"] = {"CT Image": img, **m}
    settings = bench.make_settings(atlas_set)

    # burn the same crop-grid cases as bench so the ROI bucket list matches
    cases = []
    for _ in range(4):
        ct_t, masks_t = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        cases.append(bench.to_images(ct_t, masks_t))
    t0 = time.time()
    bench.run_case(cases[0][0], settings)
    print(f"[probe] crop-grid warmup: {time.time()-t0:.1f}s", flush=True)

    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)

    t0 = time.time()
    bench.run_case(img_full, settings)
    print(f"[probe] full-grid run 1 (cold buckets): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    results, dt = bench.run_case(img_full, settings)
    print(f"[probe] full-grid run 2 (warm): {dt:.1f}s", flush=True)

    # profiled pass
    os.environ["PLATIPY_TPU_PROFILE"] = "1"
    from platipy_tpu.projects.cardiac import run as card_run
    t0 = time.time()
    results_p, dt_p = bench.run_case(img_full, settings)
    os.environ.pop("PLATIPY_TPU_PROFILE", None)
    print(f"[probe] full-grid profiled: {dt_p:.1f}s", flush=True)
    print("[probe] stage_s:", {k: round(v, 2) for k, v in
                               getattr(card_run, "LAST_STAGE_TIMES", {}).items()})
    print("[probe] stage_detail_s:", {k: round(v, 2) for k, v in
                                      getattr(card_run, "LAST_STAGE_DETAIL", {}).items()})
    from platipy_tpu.registration import linear as _lin
    print("[probe] linear_substage_s:", {k: round(v, 2) for k, v in
                                         getattr(_lin, "LAST_LINEAR_SUBSTAGES", {}).items()})

    for s in bench.STRUCTURES:
        m = bench.surface_metrics(masks_full[s], results[s])
        gt = np.asarray(masks_full[s].array)
        pred = np.asarray(results[s].array)
        gz = np.nonzero(gt.any(axis=(1, 2)))[0]
        pz = np.nonzero(pred.any(axis=(1, 2)))[0]
        print(f"[probe] {s}: {m}  gt_z=[{gz.min()},{gz.max()}] "
              f"pred_z=[{pz.min() if pz.size else -1},{pz.max() if pz.size else -1}] "
              f"gt_vox={gt.sum()} pred_vox={pred.sum()}")


if __name__ == "__main__":
    main()
