"""Test reference-style pre-cropped atlases (structures + (20,20,40) mm,
Case_X_CROP semantics): full-grid + crop-grid accuracy and wall time."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def crop_atlas_to_structures(ct, masks, expansion_mm=(20.0, 20.0, 40.0)):
    """Host-side structure crop (reference Case_X_CROP semantics)."""
    union = np.zeros(ct.shape, bool)
    for m in masks.values():
        union |= m > 0
    idx = np.argwhere(union)
    lo, hi = idx.min(axis=0), idx.max(axis=0) + 1
    sp_zyx = np.array([bench.SPACING[2], bench.SPACING[1], bench.SPACING[0]])
    exp_zyx = np.array([expansion_mm[2], expansion_mm[1], expansion_mm[0]])
    pad = np.ceil(exp_zyx / sp_zyx).astype(int)
    lo = np.maximum(lo - pad, 0)
    hi = np.minimum(hi + pad, np.array(ct.shape))
    sl = tuple(slice(a, b) for a, b in zip(lo, hi))
    return (ct[sl],
            {k: v[sl] for k, v in masks.items()},
            (int(lo[0]), int(lo[1]), int(lo[2])))


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.RandomState(7)
    ct0, masks0, fields0 = bench.build_phantom()
    atlas_set = {}
    shapes = []
    for i in range(10):
        ct_i, masks_i = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        ct_i, masks_i = bench.add_atlas_context(ct_i, masks_i)
        # consume the random-crop draws so downstream cases stay identical
        rng.randint(0, 5, size=3), rng.randint(0, 5), rng.randint(0, 5), rng.randint(0, 5)
        ct_i, masks_i, lo = crop_atlas_to_structures(ct_i, masks_i)
        shapes.append(ct_i.shape)
        origin = (lo[2] * bench.SPACING[0], lo[1] * bench.SPACING[1],
                  lo[0] * bench.SPACING[2])
        img, m = bench.to_images(ct_i, masks_i, origin_shift=origin)
        atlas_set[f"{i:02d}"] = {"CT Image": img, **m}
    print("atlas shapes:", shapes)
    settings = bench.make_settings(atlas_set)

    cases = []
    for _ in range(4):
        cases.append(bench.deform_case(ct0, fields0, rng,
                                       shift_vox=rng.randint(-3, 4, size=3)))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)

    # crop-grid warm case (same anatomy as bench's warm case 1)
    img_c, masks_c = bench.to_images(*cases[1])
    res_c, dt1 = bench.run_case(img_c, settings)
    res_c, dt2 = bench.run_case(img_c, settings)
    print(f"crop-grid: cold {dt1:.1f}s warm {dt2:.1f}s")
    for s in bench.STRUCTURES:
        print(f"  {s}: {bench.surface_metrics(masks_c[s], res_c[s])}")

    # full-FOV case
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    _, dtf1 = bench.run_case(img_full, settings)
    res_f, dtf2 = bench.run_case(img_full, settings)
    print(f"full-grid: cold {dtf1:.1f}s warm {dtf2:.1f}s")
    for s in bench.STRUCTURES:
        print(f"  {s}: {bench.surface_metrics(masks_full[s], res_f[s])}")


if __name__ == "__main__":
    main()
