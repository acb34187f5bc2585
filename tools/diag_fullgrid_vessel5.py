"""Isolate the full-grid VESSEL loss: crop-box variants + affine z-scales.

Variants (same anatomy = bench's full-grid deformation draw, untight atlases
exactly as bench builds them):
  (a) auto  : full 512x512x192 through the pipeline's auto-crop
  (b) exact : target pre-cropped to the exact pasted box (== crop-grid control)
  (c) zext  : pasted box + 20 torso-slab slices beyond each z face

If (b) ~ 0.95 and (c) ~ 0.86, the crop box's extra z-extent (torso slab vs
atlas out-of-bounds) is the cause.  Also prints the auto crop box and the
fitted per-atlas affine scales from the RIR transforms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"

import numpy as np

import bench


def run_and_score(img, masks, settings, tag):
    res, dt = bench.run_case(img, settings)
    m = bench.surface_metrics(masks["VESSEL"], res["VESSEL"])
    print(f"{tag}: {dt:.1f}s  VESSEL {m}", flush=True)
    return res


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
    for _ in range(4):
        bench.deform_case(ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    full_ct = np.asarray(img_full.array)
    z0, y0, x0 = 48, 176, 176
    cz, cy, cx = ct_f.shape

    # (a) auto
    run_and_score(img_full, masks_full, settings, "(a) auto   ")
    from platipy_tpu.projects.cardiac import run as card_run

    cb_size, cb_index = card_run.LAST_CROP_BOX
    print(f"    auto crop box: index(xyz)={cb_index} size(xyz)={cb_size}", flush=True)
    aset = card_run.LAST_ATLAS_SET_PRE_IAR
    for aid in sorted(aset):
        t = aset[aid]["RIR"]["Transform"]
        try:
            mat = np.asarray(t.as_matrix())
            scales = np.linalg.norm(mat[:3, :3], axis=0)
            print(f"    atlas {aid}: affine col-norms (x,y,z)="
                  f"{np.round(scales, 4).tolist()}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"    atlas {aid}: as_matrix failed: {e}", flush=True)

    def sub_case(zlo, zhi, ylo, yhi, xlo, xhi):
        ct_s = full_ct[zlo:zhi, ylo:yhi, xlo:xhi]
        origin = (xlo * bench.SPACING[0], ylo * bench.SPACING[1],
                  zlo * bench.SPACING[2])
        img_s = from_array(np.ascontiguousarray(ct_s), origin=origin,
                           spacing=bench.SPACING)
        masks_s = {
            k: from_array(
                np.ascontiguousarray(
                    np.asarray(v.array)[zlo:zhi, ylo:yhi, xlo:xhi]),
                origin=origin, spacing=bench.SPACING)
            for k, v in masks_full.items()
        }
        return img_s, masks_s

    # (b) exact pasted box
    img_b, masks_b = sub_case(z0, z0 + cz, y0, y0 + cy, x0, x0 + cx)
    run_and_score(img_b, masks_b, settings, "(b) exact  ")

    # (c) pasted box + 20 slab slices beyond each z face
    img_c, masks_c = sub_case(z0 - 20, z0 + cz + 20, y0, y0 + cy, x0, x0 + cx)
    run_and_score(img_c, masks_c, settings, "(c) zext   ")


if __name__ == "__main__":
    main()
