"""Pure-numpy NIfTI-1 I/O.

The reference reads/writes NIfTI through SimpleITK's C++ I/O
(sitk.ReadImage/WriteImage, used 36/19 times across platipy).  This image has
neither SimpleITK nor nibabel, so the framework carries its own reader/writer:
NIfTI-1 single-file (.nii / .nii.gz), the only on-disk format the reference
pipelines exchange.

Convention note: NIfTI affines are RAS+; ITK (and therefore the reference's
metadata semantics) is LPS.  ``read_image`` converts to LPS so origins /
directions match what ``sitk.ReadImage`` would report, and ``write_image``
round-trips back.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image

__all__ = ["read_image", "write_image"]

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}

_RAS_TO_LPS = np.diag([-1.0, -1.0, 1.0])


def _open(path: str, mode: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_image(path: str, dtype=None) -> Image:
    """Read a NIfTI-1 file into an :class:`Image` (LPS metadata, [z,y,x] array)."""
    with _open(path, "rb") as f:
        header = f.read(348)
        if len(header) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", header[:4])[0]
        endian = "<"
        if sizeof_hdr != 348:
            sizeof_hdr = struct.unpack(">i", header[:4])[0]
            if sizeof_hdr != 348:
                raise ValueError(f"{path}: not a NIfTI-1 file")
            endian = ">"

        def unpack(fmt, offset, count=1):
            size = struct.calcsize(endian + fmt * count)
            return struct.unpack(endian + fmt * count, header[offset : offset + size])

        dim = unpack("h", 40, 8)
        datatype = unpack("h", 70)[0]
        pixdim = unpack("f", 76, 8)
        vox_offset = unpack("f", 108)[0]
        scl_slope = unpack("f", 112)[0]
        scl_inter = unpack("f", 116)[0]
        qform_code = unpack("h", 252)[0]
        sform_code = unpack("h", 254)[0]
        quatern = unpack("f", 256, 3)
        qoffset = unpack("f", 268, 3)
        srow_x = unpack("f", 280, 4)
        srow_y = unpack("f", 296, 4)
        srow_z = unpack("f", 312, 4)
        magic = header[344:348]
        if magic[:3] not in (b"n+1", b"ni1"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")
        data_path = path
        if magic[:3] == b"ni1":
            # two-file NIfTI: the voxels live in the companion .img, not in
            # the header file (reading the .hdr at vox_offset returned header
            # bytes reinterpreted as voxels).  The header may itself be
            # gzipped ('x.hdr.gz') and the companion may be '.img' or
            # '.img.gz' — strip a trailing .gz before swapping the suffix
            # and probe both forms.
            hdr = Path(str(path))
            if hdr.suffix == ".gz":
                hdr = hdr.with_suffix("")
            candidates = [hdr.with_suffix(".img"),
                          hdr.with_suffix(".img.gz")]
            img = next((c for c in candidates if c.exists()), None)
            if img is None:
                raise FileNotFoundError(
                    f"{path}: two-file NIfTI (magic ni1) without its .img"
                )
            data_path = str(img)

        ndim = dim[0]
        nx, ny, nz = dim[1], max(dim[2], 1), max(dim[3], 1)
        nvols = int(np.prod([max(d, 1) for d in dim[4 : 1 + ndim]])) if ndim > 3 else 1

        np_dtype = _DTYPES.get(datatype)
        if np_dtype is None:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")

        count = nx * ny * nz * nvols
        if data_path == path:
            f.seek(int(vox_offset))
            raw = f.read(count * np.dtype(np_dtype).itemsize)
        else:
            with _open(data_path, "rb") as fi:
                fi.seek(int(max(vox_offset, 0)))
                raw = fi.read(count * np.dtype(np_dtype).itemsize)
        arr = np.frombuffer(raw, dtype=np_dtype)
        if endian == ">":
            arr = arr.byteswap()
        if nvols > 1:
            arr = arr.reshape(nvols, nz, ny, nx)
            # vector image: move components last -> [z,y,x,c]
            arr = np.moveaxis(arr, 0, -1)
        else:
            arr = arr.reshape(nz, ny, nx)

    # NaN slope/intercept mean "no scaling" (emitted by some writers); NaN
    # compares unequal to everything, so the old test multiplied the whole
    # image by NaN
    if np.isnan(scl_slope):
        scl_slope = 0.0
    if np.isnan(scl_inter):
        scl_inter = 0.0
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0 else 1.0
        arr = arr.astype(np.float32) * slope + scl_inter

    # affine: prefer sform, fall back to qform, then pixdim
    if sform_code > 0:
        affine = np.array([srow_x, srow_y, srow_z, [0, 0, 0, 1]], dtype=np.float64)
    elif qform_code > 0:
        affine = _qform_to_affine(quatern, qoffset, pixdim)
    else:
        affine = np.diag([pixdim[1], pixdim[2], pixdim[3], 1.0])

    # RAS (NIfTI) -> LPS (ITK)
    lps = affine.copy()
    lps[:3, :] = _RAS_TO_LPS @ affine[:3, :]
    spacing = np.linalg.norm(lps[:3, :3], axis=0)
    spacing = np.where(spacing == 0, 1.0, spacing)
    direction = lps[:3, :3] / spacing[None, :]
    origin = lps[:3, 3]

    if dtype is not None:
        arr = arr.astype(dtype)
    return Image(
        jnp.asarray(np.ascontiguousarray(arr)),
        origin=tuple(origin),
        spacing=tuple(spacing),
        direction=tuple(direction.reshape(-1)),
    )


def _qform_to_affine(quatern, qoffset, pixdim) -> np.ndarray:
    b, c, d = quatern
    a2 = 1.0 - (b * b + c * c + d * d)
    a = np.sqrt(max(a2, 0.0))
    r = np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
        ]
    )
    qfac = -1.0 if pixdim[0] < 0 else 1.0
    sp = np.array([pixdim[1], pixdim[2], pixdim[3] * qfac])
    affine = np.eye(4)
    affine[:3, :3] = r * sp[None, :]
    affine[:3, 3] = qoffset
    return affine


def write_image(image: Image, path: str, dtype=None):
    """Write an :class:`Image` to NIfTI-1 (.nii or .nii.gz)."""
    arr = np.asarray(image.array)
    if dtype is not None:
        arr = arr.astype(dtype)
    np_dtype = np.dtype(arr.dtype)
    if np_dtype == np.bool_:
        arr = arr.astype(np.uint8)
        np_dtype = np.dtype(np.uint8)
    if np_dtype not in _DTYPE_CODES:
        arr = arr.astype(np.float32)
        np_dtype = np.dtype(np.float32)
    datatype = _DTYPE_CODES[np_dtype]

    vector = arr.ndim == 4
    nz, ny, nx = arr.shape[:3]
    ncomp = arr.shape[3] if vector else 1

    spacing = np.asarray(image.spacing)
    direction = image.direction_matrix
    origin = np.asarray(image.origin)
    lps = np.eye(4)
    lps[:3, :3] = direction * spacing[None, :]
    lps[:3, 3] = origin
    # LPS -> RAS for the sform
    ras = lps.copy()
    ras[:3, :] = _RAS_TO_LPS @ lps[:3, :]

    header = bytearray(348)
    struct.pack_into("<i", header, 0, 348)
    ndim = 5 if vector else 3
    dim = [ndim, nx, ny, nz, 1, ncomp if vector else 1, 1, 1]
    struct.pack_into("<8h", header, 40, *dim)
    # intent: vector if multi-component
    if vector:
        struct.pack_into("<h", header, 68, 1007)  # NIFTI_INTENT_VECTOR
    struct.pack_into("<h", header, 70, datatype)
    struct.pack_into("<h", header, 72, np_dtype.itemsize * 8)
    pixdim = [1.0, float(spacing[0]), float(spacing[1]), float(spacing[2]), 1, 1, 1, 1]
    struct.pack_into("<8f", header, 76, *pixdim)
    struct.pack_into("<f", header, 108, 352.0)  # vox_offset
    struct.pack_into("<f", header, 112, 1.0)    # scl_slope
    struct.pack_into("<f", header, 116, 0.0)    # scl_inter
    struct.pack_into("<h", header, 252, 0)      # qform_code
    struct.pack_into("<h", header, 254, 1)      # sform_code = scanner
    struct.pack_into("<4f", header, 280, *ras[0, :])
    struct.pack_into("<4f", header, 296, *ras[1, :])
    struct.pack_into("<4f", header, 312, *ras[2, :])
    header[344:348] = b"n+1\x00"

    if vector:
        data = np.moveaxis(arr, -1, 0)  # [c,z,y,x] -> t/u dimension ordering
    else:
        data = arr

    with _open(path, "wb") as f:
        f.write(bytes(header))
        f.write(b"\x00\x00\x00\x00")  # extension flag
        f.write(np.ascontiguousarray(data).tobytes())
