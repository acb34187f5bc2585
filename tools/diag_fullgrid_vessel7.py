"""Variant (c) with maxed-out linear optimisation (200 iters, no convergence
window): premature-convergence / lr-scaling test for the diluted metric."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"

import numpy as np

import bench


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from platipy_tpu.core.image import from_array
    from platipy_tpu.projects.cardiac import run as card_run

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
    settings["linear_registration_settings"]["number_of_iterations"] = 200
    settings["linear_registration_settings"]["convergence_window"] = 0
    for _ in range(4):
        bench.deform_case(ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    full_ct = np.asarray(img_full.array)
    z0, y0, x0 = 48, 176, 176
    cz, cy, cx = ct_f.shape

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
    res_c, dt = bench.run_case(img_c, settings)
    print(f"(c, 200 iters) {dt:.1f}s",
          bench.surface_metrics(masks_c["VESSEL"], res_c["VESSEL"]), flush=True)
    aset = card_run.LAST_ATLAS_SET_PRE_IAR
    for aid in sorted(aset):
        mat = np.asarray(aset[aid]["RIR"]["Transform"].as_matrix())
        print(f"  atlas {aid}: scales="
              f"{np.round(np.linalg.norm(mat[:3, :3], axis=0), 4).tolist()}",
              flush=True)


if __name__ == "__main__":
    main()
