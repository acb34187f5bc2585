# platipy_tpu base image.
#
# TPU-native counterpart of the reference's base image
# (reference Dockerfile:1-17, which installs poetry + OpenGL libs for ITK/VTK).
# Here the compute stack is JAX/XLA: on a Cloud TPU VM the `tpu` extra pulls
# libtpu via the pinned jax release; on any other host jax falls back to CPU,
# which is what CI and local development use.
FROM python:3.12-slim

RUN apt-get update && DEBIAN_FRONTEND=noninteractive apt-get install -y \
    build-essential g++ curl && rm -rf /var/lib/apt/lists/*

WORKDIR /platipy_tpu

# Layer-cache the dependency install before the source copy.
COPY pyproject.toml setup.py ./
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir flax optax numpy scipy click matplotlib pandas

COPY platipy_tpu ./platipy_tpu
RUN pip install --no-cache-dir -e . --no-deps

# Build the native host fastops (connected components / EDT / region grow).
# The ctypes loader falls back to pure JAX if this fails, so best-effort.
RUN python -c "from platipy_tpu import native; native._build()" || true

ENV PYTHONPATH=/platipy_tpu
