"""Per-stage pipeline checkpointing.

The reference has NO compute checkpointing — a failed 10-atlas cardiac run
restarts from scratch (it even frees earlier stages as it goes,
reference cardiac/run.py:745,799,869).  Stage artefacts here are cheap to
persist (a crop box, N affine parameter vectors, one [N,z,y,x,3] DVF stack),
so pipelines accept a ``checkpoint_directory``: each completed stage is
written atomically and a re-run with the same directory resumes after the
last completed stage.

Format: one ``<stage>.npz`` per stage (arrays + a JSON-encoded meta entry).
Everything crosses to host once at stage boundaries, which the pipelines
already pay for output anyway.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["StageCheckpoint"]


class StageCheckpoint:
    """Atomic save/load of named stage artefacts under one directory.

    >>> ckpt = StageCheckpoint("/tmp/case1")
    >>> if not ckpt.has("dvf"):
    ...     dvf_stack = compute()
    ...     ckpt.save("dvf", arrays={"dvf": np.asarray(dvf_stack)})
    ... else:
    ...     dvf_stack = ckpt.load("dvf")["dvf"]
    """

    def __init__(self, directory: Optional[str]):
        self.directory = Path(directory) if directory else None
        if self.directory is not None:
            self.directory.mkdir(parents=True, exist_ok=True)

    @property
    def enabled(self) -> bool:
        return self.directory is not None

    def _path(self, stage: str) -> Path:
        return self.directory / f"{stage}.npz"

    def has(self, stage: str) -> bool:
        return self.enabled and self._path(stage).exists()

    def save(self, stage: str, arrays: Optional[Dict[str, Any]] = None,
             meta: Optional[Dict[str, Any]] = None) -> None:
        if not self.enabled:
            return
        payload = {k: np.asarray(v) for k, v in (arrays or {}).items()}
        payload["__meta__"] = np.frombuffer(
            json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
        )
        # atomic: write to a temp file in the same directory, then rename
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **payload)
            os.replace(tmp, self._path(stage))
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def load(self, stage: str) -> Dict[str, Any]:
        with np.load(self._path(stage), allow_pickle=False) as z:
            out = {k: z[k] for k in z.files if k != "__meta__"}
            if "__meta__" in z.files:
                out["__meta__"] = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        return out

    def meta(self, stage: str) -> Dict[str, Any]:
        return self.load(stage).get("__meta__", {})
