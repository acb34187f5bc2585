"""(b) vs (c): affine scales and per-atlas DIR vessel COM error — localise
the z-extension degradation to the linear or the demons stage."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"

import numpy as np

import bench


def slice_coms(mask):
    out = {}
    for z in range(mask.shape[0]):
        s = mask[z]
        if s.sum():
            out[z] = np.argwhere(s).mean(axis=0)
    return out


def report(tag, masks_v, res, card_run, gt_full_arr, z_off):
    aset = card_run.LAST_ATLAS_SET_PRE_IAR
    img_crop = card_run.LAST_IMG_CROP
    cb_size, cb_index = card_run.LAST_CROP_BOX
    print(f"{tag} crop box: index(xyz)={cb_index} size(xyz)={cb_size}", flush=True)
    x0, y0, z0 = cb_index
    sx, sy, sz = cb_size
    gt_crop = gt_full_arr[z0 + z_off:z0 + z_off + sz, y0:y0 + sy, x0:x0 + sx]
    gt_coms = slice_coms(gt_crop)
    for aid in sorted(aset):
        t = aset[aid]["RIR"]["Transform"]
        mat = np.asarray(t.as_matrix())
        scales = np.linalg.norm(mat[:3, :3], axis=0)
        v = np.asarray(aset[aid]["DIR"]["VESSEL"].array) > 0.5
        coms = slice_coms(v)
        errs = [float(np.hypot(*(gt_coms[z] - c)))
                for z, c in coms.items() if z in gt_coms]
        print(f"{tag} atlas {aid}: scales={np.round(scales, 4).tolist()}  "
              f"dir_vessel_com_err={np.mean(errs):.3f}", flush=True)


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
    for _ in range(4):
        bench.deform_case(ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    full_ct = np.asarray(img_full.array)
    gt_full_arr = np.asarray(masks_full["VESSEL"].array)
    z0, y0, x0 = 48, 176, 176
    cz, cy, cx = ct_f.shape

    def sub_case(zlo, zhi, ylo, yhi, xlo, xhi):
        ct_s = full_ct[zlo:zhi, ylo:yhi, xlo:xhi]
        origin = (xlo * bench.SPACING[0], ylo * bench.SPACING[1],
                  zlo * bench.SPACING[2])
        img_s = from_array(np.ascontiguousarray(ct_s), origin=origin,
                           spacing=bench.SPACING)
        masks_s = {
            k: from_array(np.ascontiguousarray(
                np.asarray(v.array)[zlo:zhi, ylo:yhi, xlo:xhi]),
                origin=origin, spacing=bench.SPACING)
            for k, v in masks_full.items()
        }
        return img_s, masks_s

    img_b, masks_b = sub_case(z0, z0 + cz, y0, y0 + cy, x0, x0 + cx)
    res_b, _ = bench.run_case(img_b, settings)
    print("(b)", bench.surface_metrics(masks_b["VESSEL"], res_b["VESSEL"]), flush=True)
    report("(b)", masks_b, res_b, card_run,
           np.asarray(masks_b["VESSEL"].array), 0)

    img_c, masks_c = sub_case(z0 - 20, z0 + cz + 20, y0, y0 + cy, x0, x0 + cx)
    res_c, _ = bench.run_case(img_c, settings)
    print("(c)", bench.surface_metrics(masks_c["VESSEL"], res_c["VESSEL"]), flush=True)
    report("(c)", masks_c, res_c, card_run,
           np.asarray(masks_c["VESSEL"].array), 0)


if __name__ == "__main__":
    main()
