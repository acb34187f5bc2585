"""Diagnose the full-grid VESSEL DSC gap (bench full-FOV case).

Reproduces bench.py's full-grid case exactly (same RNG consumption order),
runs the pipeline once, then compares per-slice vessel geometry: GT vs
result z-extent, per-slice COM error, and where the Dice loss concentrates.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = os.path.join(repo_dir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.RandomState(7)
    ct0, masks0, fields0 = bench.build_phantom()

    atlas_set = {}
    for i in range(10):
        ct_i, masks_i = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        ct_i, masks_i = bench.add_atlas_context(ct_i, masks_i)
        dz, dy, dx = rng.randint(0, 5, size=3)
        crop = ((dz, ct_i.shape[0] - rng.randint(0, 5)),
                (dy, ct_i.shape[1] - rng.randint(0, 5)),
                (dx, ct_i.shape[2] - rng.randint(0, 5)))
        img, m = bench.to_images(ct_i, masks_i, crop=crop)
        atlas_set[f"{i:02d}"] = {"CT Image": img, **m}

    settings = bench.make_settings(atlas_set)

    # consume the same RNG draws as bench (4 held-out cases) so the
    # full-grid case is IDENTICAL to the benchmarked one
    for _ in range(4):
        bench.deform_case(ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))

    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)

    results, dt = bench.run_case(img_full, settings)
    print(f"full-grid run: {dt:.2f}s")

    gt = np.asarray(masks_full["VESSEL"].array)
    auto = np.asarray(results["VESSEL"].array)
    inter = np.logical_and(gt, auto).sum()
    dsc = 2 * inter / (gt.sum() + auto.sum())
    print(f"VESSEL dsc={dsc:.4f}  gt_vox={gt.sum()}  auto_vox={auto.sum()}")

    gt_z = gt.sum(axis=(1, 2))
    auto_z = auto.sum(axis=(1, 2))
    gt_slices = np.nonzero(gt_z)[0]
    auto_slices = np.nonzero(auto_z)[0]
    print(f"GT z-extent:   [{gt_slices.min()}, {gt_slices.max()}]  ({len(gt_slices)} slices)")
    print(f"auto z-extent: [{auto_slices.min()}, {auto_slices.max()}]  ({len(auto_slices)} slices)")

    # per-slice COM error + per-slice dice on common slices
    print("\nslice |  gt_area auto_area | com_err_vox | slice_dsc")
    zz = sorted(set(gt_slices) | set(auto_slices))
    worst = []
    for z in zz:
        g, a = gt[z], auto[z]
        gs, as_ = g.sum(), a.sum()
        if gs and as_:
            gy, gx = np.argwhere(g).mean(axis=0)
            ay, ax = np.argwhere(a).mean(axis=0)
            com_err = np.hypot(gy - ay, gx - ax)
            sdsc = 2 * np.logical_and(g, a).sum() / (gs + as_)
        else:
            com_err, sdsc = float("nan"), 0.0
        worst.append((sdsc, z, gs, as_, com_err))
    worst.sort()
    for sdsc, z, gs, as_, com_err in worst[:25]:
        print(f"{z:5d} | {gs:7d} {as_:8d} | {com_err:10.2f} | {sdsc:.3f}")

    # crop box the pipeline used
    from platipy_tpu.projects.cardiac import run as card_run
    cb = getattr(card_run, "LAST_CROP_BOX", None)
    print("\ncrop box:", cb)


if __name__ == "__main__":
    main()
