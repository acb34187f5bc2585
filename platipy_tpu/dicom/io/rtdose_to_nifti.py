"""RTDOSE -> NIfTI conversion (reference: platipy/dicom/io/rtdose_to_nifti.py:19)."""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.dicom.io.dataset import Element, read_file

__all__ = ["convert_rtdose"]


def convert_rtdose(dcm_dose, force: bool = False, dose_output_path=None) -> Image:
    """Read an RTDOSE file into an Image (Gy), honouring DoseGridScaling and
    the GridFrameOffsetVector."""
    ds = read_file(str(dcm_dose))

    modality = ds.get((0x0008, 0x0060))
    if not force and (modality is None or str(modality.value) != "RTDOSE"):
        raise ValueError(f"{dcm_dose} is not an RTDOSE file")

    rows = int(ds[(0x0028, 0x0010)].value)
    cols = int(ds[(0x0028, 0x0011)].value)
    frames = int(ds.get((0x0028, 0x0008), Element(b"IS", 1)).value or 1)
    bits = int(ds.get((0x0028, 0x0100), Element(b"US", 32)).value)
    signed = int(ds.get((0x0028, 0x0103), Element(b"US", 0)).value) == 1

    raw = ds[(0x7FE0, 0x0010)].value
    dtype = {
        (16, False): np.uint16, (16, True): np.int16,
        (32, False): np.uint32, (32, True): np.int32,
    }[(bits, signed)]
    arr = np.frombuffer(raw, dtype=dtype)[: rows * cols * frames].reshape(
        frames, rows, cols
    )

    scaling = float(ds.get((0x3004, 0x000E), Element(b"DS", 1.0)).value or 1.0)
    dose = arr.astype(np.float32) * scaling

    ps = ds.get((0x0028, 0x0030))
    pixel_spacing = [float(v) for v in np.atleast_1d(ps.value)] if ps else [1.0, 1.0]
    gfov = ds.get((0x3004, 0x000C))
    if gfov is not None and np.iterable(gfov.value) and len(np.atleast_1d(gfov.value)) > 1:
        offsets = np.atleast_1d(gfov.value).astype(float)
        z_step = float(offsets[1] - offsets[0])   # signed: frames may advance
        z_spacing = abs(z_step)                   # along -normal (legal DICOM)
        z_start = float(offsets[0])               # may be non-zero
    else:
        z_step, z_spacing, z_start = 1.0, 1.0, 0.0

    ipp = ds.get((0x0020, 0x0032))
    origin = np.asarray(
        [float(v) for v in ipp.value] if ipp else (0.0, 0.0, 0.0), dtype=np.float64
    )
    iop = ds.get((0x0020, 0x0037))
    if iop is not None:
        row_dir = np.asarray(iop.value[:3], dtype=np.float64)
        col_dir = np.asarray(iop.value[3:], dtype=np.float64)
    else:
        row_dir, col_dir = np.array([1.0, 0, 0]), np.array([0, 1.0, 0])
    normal = np.cross(row_dir, col_dir)
    # frame k sits at IPP + (z_start + k*z_step) * normal: fold the vector's
    # starting offset into the origin, and flip the slice axis direction for
    # decreasing offset vectors so the geometry stays right-side-up
    origin = origin + z_start * normal
    slice_dir = normal if z_step >= 0 else -normal
    direction = np.stack([row_dir, col_dir, slice_dir], axis=1).reshape(-1)

    img = Image(
        jnp.asarray(dose),
        tuple(origin),
        (pixel_spacing[1], pixel_spacing[0], z_spacing),
        tuple(direction),
    )

    if dose_output_path is not None:
        from platipy_tpu.nifti.io import write_image

        write_image(img, str(dose_output_path))

    return img
