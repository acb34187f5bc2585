# Development image: base + test/dev tooling (reference dev.Dockerfile:1-5).
FROM platipy_tpu/platipy_tpu

RUN pip install --no-cache-dir pytest

WORKDIR /platipy_tpu
COPY tests ./tests
COPY bench.py __graft_entry__.py ./
