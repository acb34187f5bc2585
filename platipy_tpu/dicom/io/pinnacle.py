"""Native Pinnacle raw-file parsing and DICOM export.

The reference's Pinnacle export service delegates to
``pymedphys.experimental.pinnacle.PinnacleExport``
(reference services/pinnacle/service.py:26,70); pymedphys is not available
here, so the Pinnacle tar-archive formats are parsed natively:

* the ``Patient`` file and ``plan.*`` files use Pinnacle's hierarchical
  ``Key = value;`` / ``Key = { ... };`` text format -> :func:`parse_pinnacle_text`;
* ``ImageSet_%d.header`` is a flat ``key = value`` header and
  ``ImageSet_%d.img`` holds raw big-endian int16 voxels (CT number =
  HU + 1000) -> :class:`PinnacleImage`;
* ``Plan_%d/plan.roi`` holds ROI curves as point runs in Pinnacle patient
  coordinates (cm) -> :func:`parse_roi_file`.

Export covers the CT + RTSTRUCT path (the reference flags its RTPLAN output
"unverified and most likely incorrect", service.py:143-146; RTDOSE/RTPLAN
raise here).  Pinnacle->DICOM coordinate mapping is centralised in
:func:`pinnacle_to_dicom` so image voxels and ROI contours stay mutually
consistent: for head-first orientations X,Z flip sign with feet-first, and
the Pinnacle y axis (anterior up) is negated into DICOM LPS.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "parse_pinnacle_text",
    "parse_pinnacle_header",
    "parse_roi_file",
    "pinnacle_to_dicom",
    "PinnacleImage",
    "PinnaclePlan",
    "PinnacleExport",
]


# -- the hierarchical text format ------------------------------------------------

_ASSIGN_RE = re.compile(r"^\s*([\w.\[\]#-]+)\s*=\s*(.*?);?\s*$")
_OPEN_RE = re.compile(r"^\s*([\w.\[\]#-]+)\s*=\s*\{\s*$")


def _coerce(raw: str):
    raw = raw.strip()
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return raw[1:-1]
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def _attach(container: Dict, key: str, value):
    """Repeated keys (e.g. many ``ImageSet = {}`` inside ``ImageSetList``)
    collapse into a list, matching how the formats denote sequences."""
    if key in container:
        existing = container[key]
        if isinstance(existing, list):
            existing.append(value)
        else:
            container[key] = [existing, value]
    else:
        container[key] = value


def parse_pinnacle_text(text: str) -> Dict:
    """Parse Pinnacle's hierarchical ``Key = value;`` format into dicts."""
    root: Dict = {}
    stack: List[tuple] = [(None, root)]
    for line in text.splitlines():
        line = line.split("//")[0].rstrip()
        if not line.strip():
            continue
        if line.strip() in ("};", "}"):
            if len(stack) > 1:
                key, obj = stack.pop()
                _attach(stack[-1][1], key, obj)
            continue
        m = _OPEN_RE.match(line)
        if m:
            stack.append((m.group(1), {}))
            continue
        m = _ASSIGN_RE.match(line)
        if m and m.group(2) != "{":
            _attach(stack[-1][1], m.group(1), _coerce(m.group(2)))
    while len(stack) > 1:  # unclosed blocks: attach what we have
        key, obj = stack.pop()
        _attach(stack[-1][1], key, obj)
    return root


def parse_pinnacle_header(text: str) -> Dict:
    """Flat ``key = value`` / ``key : value`` header (ImageSet_%d.header)."""
    out: Dict = {}
    for line in text.splitlines():
        line = line.split("//")[0].strip().rstrip(";")
        for sep in ("=", ":"):
            if sep in line:
                key, _, raw = line.partition(sep)
                out[key.strip()] = _coerce(raw)
                break
    return out


def parse_roi_file(text: str) -> List[Dict]:
    """Parse ``plan.roi``: returns [{"name", "volume_name", "curves"}] with
    curves as [N, 3] float arrays in Pinnacle patient coordinates (cm)."""
    rois: List[Dict] = []
    roi: Optional[Dict] = None
    points: Optional[List[List[float]]] = None
    for line in text.splitlines():
        stripped = line.split("//")[0].strip()
        if not stripped:
            continue
        if stripped.startswith("roi={"):
            roi = {"name": "", "volume_name": "", "curves": []}
            rois.append(roi)
        elif roi is None:
            continue
        elif stripped.startswith("name:"):
            if not roi["name"]:
                roi["name"] = stripped.partition(":")[2].strip()
        elif stripped.startswith("volume_name:"):
            roi["volume_name"] = stripped.partition(":")[2].strip()
        elif stripped.startswith("points={"):
            points = []
        elif points is not None:
            if stripped.startswith("};"):
                if points:
                    roi["curves"].append(np.asarray(points, dtype=np.float64))
                points = None
            else:
                vals = stripped.split()
                if len(vals) >= 3:
                    try:
                        points.append([float(v) for v in vals[:3]])
                    except ValueError:
                        pass
    return rois


# -- coordinate mapping ----------------------------------------------------------


def pinnacle_to_dicom(points_cm: np.ndarray, position: str = "HFS") -> np.ndarray:
    """Map Pinnacle patient coordinates (cm) to DICOM LPS (mm).

    The Pinnacle y axis points anterior (up) where DICOM's points posterior,
    so y negates for every position; head-first vs feet-first mirrors x; the
    prone positions additionally mirror x and y.  The mapping is applied
    identically to image geometry and ROI curves, which keeps exported
    RTSTRUCTs registered to the exported CT.
    """
    pts = np.asarray(points_cm, dtype=np.float64) * 10.0
    position = (position or "HFS").upper()
    sx = -1.0 if position.startswith("FF") else 1.0
    sy = -1.0
    if position.endswith("P"):  # prone: mirror about the table
        sx, sy = -sx, -sy
    out = np.empty_like(pts)
    out[..., 0] = sx * pts[..., 0]
    out[..., 1] = sy * pts[..., 1]
    out[..., 2] = pts[..., 2]
    return out


# -- image sets ------------------------------------------------------------------


class PinnacleImage:
    """One ``ImageSet_%d`` (header + raw voxels + optional per-slice info)."""

    def __init__(self, path: Path, image_set_id: int, patient_entry: Dict = None):
        self.path = Path(path)
        self.image_set_id = int(image_set_id)
        self.patient_entry = patient_entry or {}
        header_file = self.path / f"ImageSet_{self.image_set_id}.header"
        self.header = (
            parse_pinnacle_header(header_file.read_text(errors="replace"))
            if header_file.exists() else {}
        )
        self._image_info: Optional[List[Dict]] = None
        self.series_uid = str(
            self.header.get("series_UID")
            or self.patient_entry.get("SeriesUID")
            or ""
        )

    @property
    def image_info(self) -> List[Dict]:
        """Per-slice info list (pymedphys exposes the same shape:
        ``image.image_info[0]["SeriesUID"]``, reference service.py:121)."""
        if self._image_info is None:
            info_file = self.path / f"ImageSet_{self.image_set_id}.ImageInfo"
            if info_file.exists():
                tree = parse_pinnacle_text(info_file.read_text(errors="replace"))
                items = tree.get("ImageInfo", [])
                self._image_info = items if isinstance(items, list) else [items]
            else:
                self._image_info = [{"SeriesUID": self.series_uid}]
            for item in self._image_info:
                item.setdefault("SeriesUID", self.series_uid)
        return self._image_info

    def voxel_array(self) -> np.ndarray:
        """Raw CT numbers [z, y, x] (big-endian int16 on disk; Solaris
        heritage).  CT number = HU + 1000."""
        h = self.header
        nx, ny, nz = int(h["x_dim"]), int(h["y_dim"]), int(h["z_dim"])
        img_file = self.path / f"ImageSet_{self.image_set_id}.img"
        raw = np.frombuffer(img_file.read_bytes(), dtype=">i2")
        if raw.size < nx * ny * nz:
            raise ValueError(
                f"{img_file}: expected {nx * ny * nz} voxels, found {raw.size}"
            )
        return raw[: nx * ny * nz].reshape(nz, ny, nx).astype(np.int16)

    def to_image(self):
        """Convert to a framework :class:`Image` in DICOM LPS mm, rescaled
        to HU."""
        from platipy_tpu.core.image import from_array

        h = self.header
        arr = self.voxel_array().astype(np.float32) - 1000.0
        position = str(h.get("patient_position", "HFS"))
        spacing_cm = np.array([
            float(h.get("x_pixdim", 0.1)),
            float(h.get("y_pixdim", 0.1)),
            float(h.get("z_pixdim", 0.3)),
        ])
        start_cm = np.array([
            float(h.get("x_start", 0.0)),
            float(h.get("y_start", 0.0)),
            float(h.get("z_start", 0.0)),
        ])
        # per-axis signs of pinnacle_to_dicom: a negated axis means the
        # array flips along it and the DICOM origin lands on its LAST sample
        signs = pinnacle_to_dicom(np.ones(3), position) / 10.0
        dims = np.array([arr.shape[2], arr.shape[1], arr.shape[0]])
        origin = np.empty(3)
        for a, axis in enumerate((2, 1, 0)):  # (x, y, z) -> array axis
            if signs[a] < 0:
                arr = np.flip(arr, axis=axis)
                far_cm = start_cm[a] + spacing_cm[a] * (dims[a] - 1)
                origin[a] = signs[a] * far_cm * 10.0
            else:
                origin[a] = signs[a] * start_cm[a] * 10.0
        return from_array(
            np.ascontiguousarray(arr),
            origin=tuple(float(v) for v in origin),
            spacing=tuple(float(v) * 10.0 for v in spacing_cm),
        )


# -- plans -----------------------------------------------------------------------


class PinnaclePlan:
    """One ``Plan_%d``: plan info, trials, ROIs, primary image."""

    def __init__(self, path: Path, plan_entry: Dict, images: List[PinnacleImage]):
        self.path = Path(path)
        self.plan_entry = dict(plan_entry)
        self.plan_id = int(plan_entry.get("PlanID", 0))
        self.plan_dir = self.path / f"Plan_{self.plan_id}"
        self._images = images
        self._trials: Optional[List[Dict]] = None
        self._active_trial: Optional[Dict] = None
        self._rois: Optional[List[Dict]] = None

        self.plan_info = dict(plan_entry)
        info_file = self.plan_dir / "plan.PlanInfo"
        if info_file.exists():
            self.plan_info.update(
                parse_pinnacle_text(info_file.read_text(errors="replace"))
            )
        self.plan_info.setdefault("PlanName",
                                  plan_entry.get("PlanName", f"Plan_{self.plan_id}"))
        self.plan_info.setdefault("PlanIsLocked", 0)

    @property
    def trials(self) -> List[Dict]:
        if self._trials is None:
            trial_file = self.plan_dir / "plan.Trial"
            self._trials = []
            if trial_file.exists():
                tree = parse_pinnacle_text(trial_file.read_text(errors="replace"))
                items = tree.get("TrialList", {}).get("Trial", tree.get("Trial", []))
                if isinstance(items, dict):
                    items = [items]
                self._trials = [t for t in items if isinstance(t, dict)]
            for t in self._trials:
                t.setdefault("Name", "Trial_1")
                t.setdefault("ObjectVersion", {"WriteTimeStamp": ""})
        return self._trials

    @property
    def active_trial(self) -> Dict:
        if self._active_trial is None:
            self._active_trial = (
                self.trials[0] if self.trials
                else {"Name": "Trial_1", "ObjectVersion": {"WriteTimeStamp": ""}}
            )
        return self._active_trial

    @active_trial.setter
    def active_trial(self, name: str):
        for t in self.trials:
            if t.get("Name") == name:
                self._active_trial = t
                return
        raise KeyError(f"no trial named {name!r}")

    @property
    def primary_image(self) -> Optional[PinnacleImage]:
        target = self.plan_entry.get("PrimaryCTImageSetID", 0)
        for image in self._images:
            if image.image_set_id == int(target):
                return image
        return self._images[0] if self._images else None

    @property
    def rois(self) -> List[Dict]:
        if self._rois is None:
            roi_file = self.plan_dir / "plan.roi"
            self._rois = (
                parse_roi_file(roi_file.read_text(errors="replace"))
                if roi_file.exists() else []
            )
        return self._rois


# -- export ----------------------------------------------------------------------


class PinnacleExport:
    """Export a Pinnacle patient directory to DICOM (CT + RTSTRUCT).

    API shape mirrors ``pymedphys.experimental.pinnacle.PinnacleExport`` as
    the reference service drives it (service.py:70-120): ``.plans``,
    ``.images``, ``export_image``, ``export_struct``.
    """

    def __init__(self, path, logger_arg=None):
        self.path = Path(path)
        patient_file = self.path / "Patient"
        self.patient = (
            parse_pinnacle_text(patient_file.read_text(errors="replace"))
            if patient_file.exists() else {}
        )
        self.patient_id = str(self.patient.get("PatientID", "0"))
        name = "^".join(
            str(self.patient.get(k, "")) for k in ("LastName", "FirstName")
        ).strip("^") or "Unknown"
        self.patient_name = name
        self._exported_series: Dict[int, List[str]] = {}

        image_entries = self.patient.get("ImageSetList", {}).get("ImageSet", [])
        if isinstance(image_entries, dict):
            image_entries = [image_entries]
        self.images: List[PinnacleImage] = []
        seen = set()
        for entry in image_entries:
            set_id = int(entry.get("ImageSetID", len(self.images)))
            seen.add(set_id)
            self.images.append(PinnacleImage(self.path, set_id, entry))
        for header in sorted(self.path.glob("ImageSet_*.header")):
            set_id = int(header.stem.split("_")[1])
            if set_id not in seen:
                self.images.append(PinnacleImage(self.path, set_id))

        plan_entries = self.patient.get("PlanList", {}).get("Plan", [])
        if isinstance(plan_entries, dict):
            plan_entries = [plan_entries]
        self.plans: List[PinnaclePlan] = [
            PinnaclePlan(self.path, entry, self.images) for entry in plan_entries
        ]

    def export_image(self, image: PinnacleImage, export_path) -> List[str]:
        """Write the image set as a DICOM CT series."""
        from platipy_tpu.dicom.io.dataset import generate_uid
        from platipy_tpu.dicom.io.series import write_dicom_series

        if image is None:
            return []
        img = image.to_image()
        series_uid = image.series_uid or generate_uid()
        study_uid = str(
            image.header.get("study_UID")
            or self.patient.get("StudyInstanceUID")
            or generate_uid()
        )
        paths = write_dicom_series(
            img, export_path, modality="CT", patient_id=self.patient_id,
            tag_overrides={
                (0x0010, 0x0010): self.patient_name,
                (0x0020, 0x000D): study_uid,
                (0x0020, 0x000E): series_uid,
            },
        )
        self._exported_series[image.image_set_id] = paths
        return paths

    def export_struct(self, plan: PinnaclePlan, export_path) -> Optional[str]:
        """Write the plan's ROIs as an RTSTRUCT referencing the primary CT.

        The CT series must exist at ``export_path`` (export_image first —
        the reference service exports in that order, service.py:102-108).
        """
        from platipy_tpu.dicom.io.dataset import (
            Element, generate_uid, read_file, write_file,
        )
        from platipy_tpu.dicom.io.series import find_dicom_files, group_dicom_files

        primary = plan.primary_image
        position = str(
            (primary.header if primary else {}).get("patient_position", "HFS")
        )
        series_files = self._exported_series.get(
            primary.image_set_id if primary else -1
        )
        if not series_files:
            files = find_dicom_files(export_path)
            groups = group_dicom_files(files)
            if not groups:
                raise RuntimeError(
                    "export_struct requires the CT series exported first"
                )
            series_files = max(groups.values(), key=len)
        datasets = [read_file(f) for f in series_files]
        first = datasets[0]
        normal = np.array([0.0, 0.0, 1.0])
        datasets.sort(key=lambda d: float(
            np.dot(np.asarray(d[(0x0020, 0x0032)].value), normal)
        ))
        sop_uids = [d[(0x0008, 0x0018)].value for d in datasets]
        zs = [float(d[(0x0020, 0x0032)].value[2]) for d in datasets]
        img_sop_class = first[(0x0008, 0x0016)].value
        study_uid = first[(0x0020, 0x000D)].value
        series_uid_img = first[(0x0020, 0x000E)].value
        frame_uid = generate_uid()

        colors = [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
                  [0, 255, 255], [255, 0, 255], [255, 128, 0], [128, 0, 255]]
        roi_contour_items = []
        structure_set_items = []
        for roi_number, roi in enumerate(plan.rois, start=1):
            contour_items = []
            for curve_cm in roi["curves"]:
                pts = pinnacle_to_dicom(curve_cm, position)
                z = float(np.mean(pts[:, 2]))
                ref_idx = int(np.argmin([abs(z - zz) for zz in zs]))
                contour_items.append({
                    (0x3006, 0x0016): Element(b"SQ", [{
                        (0x0008, 0x1150): Element(b"UI", img_sop_class),
                        (0x0008, 0x1155): Element(b"UI", sop_uids[ref_idx]),
                    }]),
                    (0x3006, 0x0042): Element(b"CS", "CLOSED_PLANAR"),
                    (0x3006, 0x0046): Element(b"IS", pts.shape[0]),
                    (0x3006, 0x0050): Element(
                        b"DS", [float(v) for v in pts.reshape(-1)]
                    ),
                })
            roi_contour_items.append({
                (0x3006, 0x002A): Element(
                    b"IS", colors[(roi_number - 1) % len(colors)]
                ),
                (0x3006, 0x0040): Element(b"SQ", contour_items),
                (0x3006, 0x0084): Element(b"IS", roi_number),
            })
            structure_set_items.append({
                (0x3006, 0x0022): Element(b"IS", roi_number),
                (0x3006, 0x0024): Element(b"UI", frame_uid),
                (0x3006, 0x0026): Element(b"LO", roi["name"]),
                (0x3006, 0x0036): Element(b"CS", "MANUAL"),
            })

        rt_sop_class = "1.2.840.10008.5.1.4.1.1.481.3"
        rt_sop_uid = generate_uid()
        ds = {
            (0x0008, 0x0016): Element(b"UI", rt_sop_class),
            (0x0008, 0x0018): Element(b"UI", rt_sop_uid),
            (0x0008, 0x0060): Element(b"CS", "RTSTRUCT"),
            (0x0010, 0x0010): Element(b"PN", self.patient_name),
            (0x0010, 0x0020): Element(b"LO", self.patient_id),
            (0x0020, 0x000D): Element(b"UI", study_uid),
            (0x0020, 0x000E): Element(b"UI", generate_uid()),
            (0x0020, 0x0011): Element(b"IS", 1),
            (0x3006, 0x0002): Element(
                b"SH", str(plan.plan_info.get("PlanName", "Pinnacle"))[:16]
            ),
            (0x3006, 0x0010): Element(b"SQ", [{
                (0x0020, 0x0052): Element(b"UI", frame_uid),
                (0x3006, 0x0012): Element(b"SQ", [{
                    (0x0008, 0x1150): Element(b"UI", "1.2.840.10008.3.1.2.3.1"),
                    (0x0008, 0x1155): Element(b"UI", study_uid),
                    (0x3006, 0x0014): Element(b"SQ", [{
                        (0x0020, 0x000E): Element(b"UI", series_uid_img),
                        (0x3006, 0x0016): Element(b"SQ", [
                            {
                                (0x0008, 0x1150): Element(b"UI", img_sop_class),
                                (0x0008, 0x1155): Element(b"UI", uid),
                            }
                            for uid in sop_uids
                        ]),
                    }]),
                }]),
            }]),
            (0x3006, 0x0020): Element(b"SQ", structure_set_items),
            (0x3006, 0x0039): Element(b"SQ", roi_contour_items),
            (0x3006, 0x0080): Element(b"SQ", [
                {
                    (0x3006, 0x0082): Element(b"IS", i + 1),
                    (0x3006, 0x0084): Element(b"IS", i + 1),
                    (0x3006, 0x0085): Element(b"SH", roi["name"][:16]),
                    (0x3006, 0x00A4): Element(b"CS", "ORGAN"),
                    (0x3006, 0x00A6): Element(b"PN", "platipy_tpu"),
                }
                for i, roi in enumerate(plan.rois)
            ]),
        }
        out = str(Path(export_path) / f"RS.{rt_sop_uid}.dcm")
        write_file(out, ds, rt_sop_class, rt_sop_uid)
        return out

    def export_plan(self, plan, export_path):
        raise NotImplementedError(
            "RTPLAN export is out of scope: the reference marks its own "
            "RTPLAN output 'unverified and most likely incorrect' "
            "(reference services/pinnacle/service.py:143-146)"
        )

    def export_dose(self, plan, export_path):
        raise NotImplementedError(
            "RTDOSE export (trial binary dose grids) is not implemented"
        )
