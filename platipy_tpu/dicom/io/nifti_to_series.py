"""NIfTI -> DICOM series conversion
(reference: platipy/dicom/io/nifti_to_series.py:22)."""

from __future__ import annotations

from platipy_tpu.dicom.io.series import write_dicom_series

__all__ = ["convert_nifti_to_dicom_series"]


def convert_nifti_to_dicom_series(
    image,
    reference_dcm=None,
    tag_overrides=None,
    output_directory: str = ".",
):
    """Write an Image (or NIfTI path) as a DICOM series, optionally copying
    patient tags from a reference DICOM file."""
    from platipy_tpu.core.image import Image
    from platipy_tpu.nifti.io import read_image

    if not isinstance(image, Image):
        image = read_image(str(image))

    overrides = {}
    if reference_dcm is not None:
        from platipy_tpu.dicom.io.dataset import read_file
        from platipy_tpu.dicom.io.series import find_dicom_files

        files = find_dicom_files(reference_dcm)
        if files:
            ref = read_file(files[0])
            for tag in ((0x0010, 0x0010), (0x0010, 0x0020), (0x0010, 0x0030),
                        (0x0010, 0x0040)):
                if tag in ref:
                    overrides[tag] = ref[tag].value
    if tag_overrides:
        overrides.update(tag_overrides)

    return write_dicom_series(
        image, output_directory, modality="CT", tag_overrides=overrides
    )
