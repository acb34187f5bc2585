"""platipy_tpu — a TPU-native medical imaging framework.

A from-scratch rebuild of the capabilities of pyplati/platipy on JAX / XLA /
Pallas: image registration (linear, demons, B-spline), label fusion and
comparison, multi-atlas segmentation pipelines, synthetic deformation,
dose analysis, visualisation, DICOM/NIfTI I/O, a service backend, and a CLI —
with the compute core running on TPU device meshes instead of ITK's C++
threads.
"""

__version__ = "0.1.0"

from platipy_tpu.core.image import Image, from_array, like  # noqa: F401
