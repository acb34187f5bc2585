"""Control experiment: the bench full-grid case's DEFORMATION, run as a
plain crop-grid case (no embedding, no auto-crop).  Separates 'this draw is
harder' from 'the full-FOV path degrades registration'."""

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
    for _ in range(4):
        bench.deform_case(ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)

    # control: crop-grid (the exact same anatomy, no embedding)
    img_c, masks_c = bench.to_images(ct_f, masks_f)
    res_c, dt_c = bench.run_case(img_c, settings)
    for s in bench.STRUCTURES:
        m = bench.surface_metrics(masks_c[s], res_c[s])
        print(f"crop-grid  {s}: {m}")
    print(f"crop-grid run: {dt_c:.1f}s")


if __name__ == "__main__":
    main()
