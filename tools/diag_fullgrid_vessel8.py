"""HU-gated no-guide demons: variant (c) (the failing torso-slab-extended
crop) + a crop-grid warm case, with hu_gate_threshold=-400."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from platipy_tpu.core.image import from_array

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
    settings["deformable_registration_settings"]["oob_inherit_fixed"] = True

    cases = []
    for _ in range(4):
        cases.append(bench.deform_case(ct0, fields0, rng,
                                       shift_vox=rng.randint(-3, 4, size=3)))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    full_ct = np.asarray(img_full.array)
    z0, y0, x0 = 48, 176, 176
    cz, cy, cx = ct_f.shape

    # crop-grid warm case with gating (regression check)
    img_w, masks_w = bench.to_images(*cases[1])
    res_w, dt_w = bench.run_case(img_w, settings)
    print(f"crop-grid gated: {dt_w:.1f}s", flush=True)
    for s in bench.STRUCTURES:
        print(f"  {s}: {bench.surface_metrics(masks_w[s], res_w[s])}", flush=True)

    # variant (c) with gating
    zlo, zhi = z0 - 20, z0 + cz + 20
    ct_s = full_ct[zlo:zhi, y0:y0 + cy, x0:x0 + cx]
    origin = (x0 * bench.SPACING[0], y0 * bench.SPACING[1], zlo * bench.SPACING[2])
    img_c = from_array(np.ascontiguousarray(ct_s), origin=origin, spacing=bench.SPACING)
    masks_c = {
        k: from_array(np.ascontiguousarray(
            np.asarray(v.array)[zlo:zhi, y0:y0 + cy, x0:x0 + cx]),
            origin=origin, spacing=bench.SPACING)
        for k, v in masks_full.items()
    }
    res_c, dt_c = bench.run_case(img_c, settings)
    print(f"(c) gated: {dt_c:.1f}s",
          bench.surface_metrics(masks_c["VESSEL"], res_c["VESSEL"]), flush=True)

    # full auto path with gating
    res_a, dt_a = bench.run_case(img_full, settings)
    print(f"(a) auto gated: {dt_a:.1f}s", flush=True)
    for s in bench.STRUCTURES:
        print(f"  {s}: {bench.surface_metrics(masks_full[s], res_a[s])}", flush=True)


if __name__ == "__main__":
    main()
