"""DICOM DIMSE networking (reference: platipy/dicom/communication/connector.py:43-394).

The reference builds on pynetdicom; here the DIMSE services it uses run on
the framework's own Upper Layer implementation
(:mod:`platipy_tpu.dicom.communication.upper_layer`) — no third-party
dependency: C-ECHO, C-FIND, C-MOVE, C-GET (with interleaved C-STORE
sub-operations on the requesting association), C-STORE, a Storage SCP
listener, and a Query/Retrieve SCP serving FIND/GET/MOVE from a directory.
"""

from __future__ import annotations

import logging
from pathlib import Path

from platipy_tpu.dicom.communication import upper_layer as ul

logger = logging.getLogger(__name__)

__all__ = ["DicomConnector"]

class DicomConnector:
    """DIMSE SCU/SCP connector (C-ECHO, C-FIND, C-MOVE, C-GET, C-STORE)."""

    def __init__(self, host="127.0.0.1", port=11112, ae_title="PLATIPYTPU",
                 output_directory=None, local_ae="PLATIPYTPU"):
        """``ae_title`` is the PEER's AE title (the CALLED AE on outgoing
        associations — matching pynetdicom's ``associate(ae_title=...)``
        semantics the reference relies on); ``local_ae`` is this node's
        (calling) AE.  ``listen`` uses ``ae_title`` as the local SCP title,
        mirroring the reference's listener construction."""
        self.host = host
        self.port = port
        self.ae_title = ae_title or "PLATIPYTPU"
        self.local_ae = local_ae or "PLATIPYTPU"
        self.output_directory = output_directory or "./dicom_output"
        self.current_dir = None
        self.recieved_callback = None
        self._scp = None

    def verify(self) -> bool:
        """C-ECHO to the configured peer (reference connector.py:60-84)."""
        try:
            return ul.c_echo(self.host, self.port, calling=self.local_ae,
                             called=self.ae_title)
        except (ConnectionError, OSError) as exc:
            logger.warning("C-ECHO to %s:%s failed: %s", self.host, self.port, exc)
            return False

    def do_find(self, dataset, query_model="S"):
        """C-FIND query (reference connector.py:85-133).

        ``dataset``: a dict of {(group, element): value/Element} query keys.
        Returns the matching identifier datasets.
        """
        return ul.c_find(self.host, self.port, dataset, query_model=query_model,
                         calling=self.local_ae, called=self.ae_title)

    def move_series(self, seriesInstanceUID, move_aet=None, query_model="S"):
        """C-MOVE a series to an AE title (reference connector.py:134-165);
        start :meth:`listen` first to receive it on this host."""
        from platipy_tpu.dicom.io.dataset import Element

        identifier = {
            (0x0008, 0x0052): Element(b"CS", "SERIES"),
            (0x0020, 0x000E): Element(b"UI", seriesInstanceUID),
        }
        return ul.c_move(self.host, self.port, identifier,
                         move_aet or self.local_ae, query_model=query_model,
                         calling=self.local_ae, called=self.ae_title)

    def download_series(self, seriesInstanceUID, recursive=True,
                        query_model="S"):
        """C-GET a series into the output directory (reference
        connector.py:166-308): the peer's C-STORE sub-operations arrive
        interleaved on the requesting association — no listener needed."""
        from platipy_tpu.dicom.io.dataset import Element

        out_dir = Path(self.output_directory)
        out_dir.mkdir(parents=True, exist_ok=True)
        identifier = {
            (0x0008, 0x0052): Element(b"CS", "SERIES"),
            (0x0020, 0x000E): Element(b"UI", seriesInstanceUID),
        }
        counts, paths = ul.c_get(
            self.host, self.port, identifier, out_dir,
            query_model=query_model, calling=self.local_ae,
            called=self.ae_title,
        )
        logger.info("C-GET of %s: %s", seriesInstanceUID, counts)
        self.current_dir = (
            str(Path(paths[0]).parent) if paths
            else str(out_dir / seriesInstanceUID)
        )
        return self.current_dir

    def send_dcm(self, dcm_file) -> bool:
        """C-STORE one or more files (reference connector.py:309-372)."""
        files = ([dcm_file] if isinstance(dcm_file, (str, Path))
                 else list(dcm_file))
        try:
            stored = ul.c_store(self.host, self.port, files, calling=self.local_ae,
                                called=self.ae_title)
        except (ConnectionError, OSError) as exc:
            logger.warning("C-STORE to %s:%s failed: %s", self.host, self.port, exc)
            return False
        return stored == len(files)

    def listen(self, on_released_callback=None, ae_title=None, block=True):
        """Start a Verification+Storage SCP (reference connector.py:373-394).

        Received instances are written under ``output_directory/<SeriesUID>/``.
        Pass ``block=False`` to run it on a background thread (returns the
        server for ``shutdown()``).
        """
        def on_store(path, ds):
            if on_released_callback is None:
                return
            # support both 1-arg (path) and 2-arg (path, dataset) callbacks
            import inspect

            try:
                n_params = len(inspect.signature(on_released_callback).parameters)
            except (TypeError, ValueError):
                n_params = 1
            if n_params >= 2:
                on_released_callback(path, ds)
            else:
                on_released_callback(path)

        self._scp = ul.StorageSCP(
            "0.0.0.0", self.port, output_directory=self.output_directory,
            on_store=on_store if on_released_callback else None,
        )
        if block:
            self._scp.serve_forever()
        else:
            self._scp.start_background()
        return self._scp
