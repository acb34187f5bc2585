"""From-scratch DICOM Upper Layer (PS3.8) + DIMSE (PS3.7) implementation.

The reference delegates DIMSE networking to pynetdicom
(reference dicom/communication/connector.py:43-394); this environment does
not ship it, so the association state machine, PDU codec and the DIMSE
services the reference actually uses are implemented here directly:

* A-ASSOCIATE-RQ/AC/RJ, P-DATA-TF, A-RELEASE-RQ/RP, A-ABORT PDUs;
* C-ECHO SCU (``connector.verify``, reference :60-84);
* C-STORE SCU (``connector.send_dcm_files``, reference :309-370);
* a Storage/Verification SCP listener (``connector.listen``,
  reference :373-394) writing received instances to a directory.

Command sets are implicit VR little endian (mandated); data sets are sent in
explicit VR little endian (proposed first) or implicit VR LE.
"""

from __future__ import annotations

import logging
import socket
import socketserver
import struct
import threading
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from platipy_tpu.dicom.io.dataset import (
    Element,
    _write_element,
    read_dataset,
)

logger = logging.getLogger(__name__)

APPLICATION_CONTEXT = "1.2.840.10008.3.1.1.1"
VERIFICATION_SOP = "1.2.840.10008.1.1"
IMPLICIT_VR_LE = "1.2.840.10008.1.2"
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"

# common storage SOP classes the listener accepts (CT/MR/PT/RTSTRUCT/RTDOSE/
# RTPLAN/secondary capture — the set the reference's crawler handles)
STORAGE_SOP_CLASSES = [
    "1.2.840.10008.5.1.4.1.1.2",      # CT
    "1.2.840.10008.5.1.4.1.1.4",      # MR
    "1.2.840.10008.5.1.4.1.1.128",    # PET
    "1.2.840.10008.5.1.4.1.1.481.3",  # RTSTRUCT
    "1.2.840.10008.5.1.4.1.1.481.2",  # RTDOSE
    "1.2.840.10008.5.1.4.1.1.481.5",  # RTPLAN
    "1.2.840.10008.5.1.4.1.1.7",      # Secondary capture
]

# -- PDU encoding -------------------------------------------------------------


def _pad_ae(title: str) -> bytes:
    return title.encode("ascii")[:16].ljust(16, b" ")


def _item(item_type: int, body: bytes) -> bytes:
    return struct.pack(">BBH", item_type, 0, len(body)) + body


def _pdu(pdu_type: int, body: bytes) -> bytes:
    return struct.pack(">BBI", pdu_type, 0, len(body)) + body


def _uid_bytes(uid: str) -> bytes:
    raw = uid.encode("ascii")
    return raw + (b"\x00" if len(raw) % 2 else b"")


def encode_associate_rq(calling: str, called: str,
                        contexts: List[Tuple[int, str, List[str]]],
                        max_pdu: int = 65536) -> bytes:
    body = struct.pack(">HH", 1, 0) + _pad_ae(called) + _pad_ae(calling) + b"\x00" * 32
    body += _item(0x10, _uid_bytes(APPLICATION_CONTEXT))
    for ctx_id, abstract, transfers in contexts:
        sub = struct.pack(">BBBB", ctx_id, 0, 0, 0)
        sub += _item(0x30, _uid_bytes(abstract))
        for ts in transfers:
            sub += _item(0x40, _uid_bytes(ts))
        body += _item(0x20, sub)
    user = _item(0x51, struct.pack(">I", max_pdu))
    body += _item(0x50, user)
    return _pdu(0x01, body)


def encode_associate_ac(calling: str, called: str,
                        results: List[Tuple[int, int, str]],
                        max_pdu: int = 65536) -> bytes:
    """results: (ctx_id, result 0=accept/3+=reject, transfer_syntax)."""
    body = struct.pack(">HH", 1, 0) + _pad_ae(called) + _pad_ae(calling) + b"\x00" * 32
    body += _item(0x10, _uid_bytes(APPLICATION_CONTEXT))
    for ctx_id, result, ts in results:
        sub = struct.pack(">BBBB", ctx_id, 0, result, 0)
        sub += _item(0x40, _uid_bytes(ts))
        body += _item(0x21, sub)
    body += _item(0x50, _item(0x51, struct.pack(">I", max_pdu)))
    return _pdu(0x02, body)


def _parse_items(body: bytes):
    pos = 0
    while pos + 4 <= len(body):
        t, _, n = struct.unpack(">BBH", body[pos : pos + 4])
        yield t, body[pos + 4 : pos + 4 + n]
        pos += 4 + n


def parse_associate(body: bytes):
    """Parse RQ or AC body -> (called, calling, contexts, max_pdu).

    contexts: list of (ctx_id, result_or_0, abstract_or_None, [transfers]).
    """
    called = body[4:20].decode("ascii").strip()
    calling = body[20:36].decode("ascii").strip()
    contexts = []
    max_pdu = 16384
    for t, item in _parse_items(body[68:]):
        if t in (0x20, 0x21):
            ctx_id, _, result, _ = struct.unpack(">BBBB", item[:4])
            abstract = None
            transfers = []
            for st, sub in _parse_items(item[4:]):
                if st == 0x30:
                    abstract = sub.rstrip(b"\x00").decode("ascii")
                elif st == 0x40:
                    transfers.append(sub.rstrip(b"\x00").decode("ascii"))
            contexts.append((ctx_id, result, abstract, transfers))
        elif t == 0x50:
            for st, sub in _parse_items(item):
                if st == 0x51:
                    max_pdu = struct.unpack(">I", sub)[0]
    return called, calling, contexts, max_pdu


def encode_pdata(ctx_id: int, payload: bytes, is_command: bool,
                 max_pdu: int = 65536) -> List[bytes]:
    """Fragment a command/data payload into P-DATA-TF PDUs.

    ``max_pdu`` is the PEER's advertised maximum PDU length and must be
    honoured even when small (strict SCPs A-ABORT on oversized PDUs);
    0 means unlimited (PS3.8 annex D) — use 64 KiB.
    """
    chunk = (64 * 1024 - 12) if max_pdu == 0 else max(16, max_pdu - 12)
    pdus = []
    for i in range(0, len(payload), chunk):
        frag = payload[i : i + chunk]
        last = i + chunk >= len(payload)
        header = (0x01 if is_command else 0x00) | (0x02 if last else 0x00)
        pdv = struct.pack(">IB", len(frag) + 2, ctx_id) + bytes([header]) + frag
        pdus.append(_pdu(0x04, pdv))
    return pdus


# -- DIMSE command sets (implicit VR LE) --------------------------------------


def _encode_command(elements: Dict[Tuple[int, int], bytes]) -> bytes:
    body = bytearray()
    for tag in sorted(elements):
        raw = elements[tag]
        if len(raw) % 2:
            raw += b"\x00"
        body += struct.pack("<HHI", tag[0], tag[1], len(raw)) + raw
    out = struct.pack("<HHI", 0, 0, 4) + struct.pack("<I", len(body))
    return bytes(out) + bytes(body)


def _ui(uid: str) -> bytes:
    return uid.encode("ascii")


def _us(v: int) -> bytes:
    return struct.pack("<H", v)


def decode_command(data: bytes) -> Dict[Tuple[int, int], bytes]:
    out = {}
    pos = 0
    while pos + 8 <= len(data):
        g, e, n = struct.unpack("<HHI", data[pos : pos + 8])
        out[(g, e)] = data[pos + 8 : pos + 8 + n]
        pos += 8 + n
    return out


def c_echo_rq(message_id: int = 1) -> bytes:
    return _encode_command({
        (0x0000, 0x0002): _ui(VERIFICATION_SOP),
        (0x0000, 0x0100): _us(0x0030),
        (0x0000, 0x0110): _us(message_id),
        (0x0000, 0x0800): _us(0x0101),
    })


def c_echo_rsp(message_id: int, status: int = 0) -> bytes:
    return _encode_command({
        (0x0000, 0x0002): _ui(VERIFICATION_SOP),
        (0x0000, 0x0100): _us(0x8030),
        (0x0000, 0x0120): _us(message_id),
        (0x0000, 0x0800): _us(0x0101),
        (0x0000, 0x0900): _us(status),
    })


def c_store_rq(sop_class: str, sop_instance: str, message_id: int = 1) -> bytes:
    return _encode_command({
        (0x0000, 0x0002): _ui(sop_class),
        (0x0000, 0x0100): _us(0x0001),
        (0x0000, 0x0110): _us(message_id),
        (0x0000, 0x0700): _us(0x0002),  # priority: low
        (0x0000, 0x0800): _us(0x0000),  # dataset follows
        (0x0000, 0x1000): _ui(sop_instance),
    })


def c_store_rsp(sop_class: str, sop_instance: str, message_id: int,
                status: int = 0) -> bytes:
    return _encode_command({
        (0x0000, 0x0002): _ui(sop_class),
        (0x0000, 0x0100): _us(0x8001),
        (0x0000, 0x0120): _us(message_id),
        (0x0000, 0x0800): _us(0x0101),
        (0x0000, 0x0900): _us(status),
        (0x0000, 0x1000): _ui(sop_instance),
    })


# -- association (SCU side) ----------------------------------------------------


class Association:
    """One SCU association: connect, negotiate, exchange DIMSE, release."""

    def __init__(self, host: str, port: int, calling: str, called: str,
                 contexts: List[Tuple[str, List[str]]], timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.max_pdu = 65536
        numbered = [
            (1 + 2 * i, abstract, transfers)
            for i, (abstract, transfers) in enumerate(contexts)
        ]
        self.sock.sendall(encode_associate_rq(calling, called, numbered))
        pdu_type, body = self._read_pdu()
        if pdu_type == 0x03:
            raise ConnectionError("association rejected (A-ASSOCIATE-RJ)")
        if pdu_type != 0x02:
            raise ConnectionError(f"unexpected PDU 0x{pdu_type:02x} during association")
        _, _, results, self.max_pdu = parse_associate(body)
        self.accepted: Dict[int, str] = {
            ctx_id: transfers[0]
            for ctx_id, result, _a, transfers in results
            if result == 0 and transfers
        }
        self.abstract_by_id = {ctx_id: abstract for ctx_id, abstract, _t in numbered}
        if not self.accepted:
            self.release()
            raise ConnectionError("no presentation context accepted")

    def context_for(self, abstract: str) -> int:
        for ctx_id, a in self.abstract_by_id.items():
            if a == abstract and ctx_id in self.accepted:
                return ctx_id
        raise KeyError(f"no accepted context for {abstract}")

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed connection")
            buf += chunk
        return buf

    def _read_pdu(self) -> Tuple[int, bytes]:
        header = self._read_exact(6)
        pdu_type, _, length = struct.unpack(">BBI", header)
        return pdu_type, self._read_exact(length)

    def send_dimse(self, ctx_id: int, command: bytes,
                   dataset: Optional[bytes] = None) -> None:
        for pdu in encode_pdata(ctx_id, command, True, self.max_pdu):
            self.sock.sendall(pdu)
        if dataset is not None:
            for pdu in encode_pdata(ctx_id, dataset, False, self.max_pdu):
                self.sock.sendall(pdu)

    def _next_pdv(self) -> Tuple[int, int, bytes]:
        """Next PDV (ctx_id, header, fragment) — from the carry-over queue or
        by reading another P-DATA-TF PDU.  One PDU may legally hold PDVs of
        several DIMSE messages (PS3.8 §9.3.5); PDVs past the current message
        must survive for the next recv_dimse call."""
        pending = getattr(self, "_pending_pdvs", None)
        if pending is None:
            pending = self._pending_pdvs = []
        while not pending:
            pdu_type, body = self._read_pdu()
            if pdu_type == 0x07:
                raise ConnectionError("association aborted by peer")
            if pdu_type != 0x04:
                raise ConnectionError(f"unexpected PDU 0x{pdu_type:02x}")
            pos = 0
            while pos < len(body):
                (n,) = struct.unpack(">I", body[pos : pos + 4])
                pending.append(
                    (body[pos + 4], body[pos + 5], bytes(body[pos + 6 : pos + 4 + n]))
                )
                pos += 4 + n
        return pending.pop(0)

    def recv_dimse(self) -> Tuple[int, bytes, bytes]:
        """Collect PDVs until a complete command (+dataset if indicated)."""
        command = bytearray()
        dataset = bytearray()
        ctx_id = 0
        cmd_done = False
        needs_data = False
        data_done = False
        while not (cmd_done and (not needs_data or data_done)):
            ctx_id, header, frag = self._next_pdv()
            if header & 0x01:
                command += frag
                if header & 0x02:
                    cmd_done = True
                    cmd = decode_command(bytes(command))
                    dst = cmd.get((0x0000, 0x0800), b"\x01\x01")
                    needs_data = struct.unpack("<H", dst[:2])[0] != 0x0101
            else:
                dataset += frag
                if header & 0x02:
                    data_done = True
        return ctx_id, bytes(command), bytes(dataset)

    def release(self) -> None:
        try:
            self.sock.sendall(_pdu(0x05, b"\x00" * 4))
            self._read_pdu()  # A-RELEASE-RP
        except Exception:
            pass
        finally:
            self.sock.close()


# -- SCU services ---------------------------------------------------------------


def c_echo(host: str, port: int, calling: str = "PLATIPYTPU",
           called: str = "ANYSCP", timeout: float = 30.0) -> bool:
    """Verification SCU (the reference's ``connector.verify``)."""
    assoc = Association(
        host, port, calling, called,
        [(VERIFICATION_SOP, [IMPLICIT_VR_LE])], timeout=timeout,
    )
    try:
        ctx = assoc.context_for(VERIFICATION_SOP)
        assoc.send_dimse(ctx, c_echo_rq())
        _, cmd_raw, _ = assoc.recv_dimse()
        cmd = decode_command(cmd_raw)
        status = struct.unpack("<H", cmd.get((0x0000, 0x0900), b"\xff\xff")[:2])[0]
        return status == 0
    finally:
        assoc.release()


def c_store(host: str, port: int, file_paths, calling: str = "PLATIPYTPU",
            called: str = "ANYSCP", timeout: float = 60.0) -> int:
    """Storage SCU: send part-10 files; returns the number stored OK."""
    files = [str(p) for p in file_paths]
    datasets = []
    sop_classes = set()
    for path in files:
        ds = read_dataset_from_file(path)
        sop_class = ds[(0x0008, 0x0016)].value
        sop_inst = ds[(0x0008, 0x0018)].value
        body = bytearray()
        for t in sorted(k for k in ds.keys() if k[0] != 0x0002):
            _write_element(body, t, ds[t])
        datasets.append((sop_class, sop_inst, bytes(body)))
        sop_classes.add(sop_class)

    contexts = [(sc, [EXPLICIT_VR_LE]) for sc in sorted(sop_classes)]
    assoc = Association(host, port, calling, called, contexts, timeout=timeout)
    stored = 0
    try:
        for i, (sop_class, sop_inst, body) in enumerate(datasets):
            ctx = assoc.context_for(sop_class)
            assoc.send_dimse(ctx, c_store_rq(sop_class, sop_inst, i + 1), body)
            _, cmd_raw, _ = assoc.recv_dimse()
            cmd = decode_command(cmd_raw)
            status = struct.unpack(
                "<H", cmd.get((0x0000, 0x0900), b"\xff\xff")[:2]
            )[0]
            if status == 0:
                stored += 1
            else:
                logger.warning("C-STORE of %s returned status 0x%04x", sop_inst, status)
    finally:
        assoc.release()
    return stored


def read_dataset_from_file(path: str):
    from platipy_tpu.dicom.io.dataset import read_file

    return read_file(path)


# -- SCP (listener) --------------------------------------------------------------


class _SCPHandler(socketserver.BaseRequestHandler):
    def handle(self):  # noqa: C901 - protocol state machine
        sock = self.request
        server: StorageSCP = self.server  # type: ignore[assignment]

        def read_exact(n):
            buf = b""
            while len(buf) < n:
                chunk = sock.recv(n - len(buf))
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            return buf

        def read_pdu():
            header = read_exact(6)
            pdu_type, _, length = struct.unpack(">BBI", header)
            return pdu_type, read_exact(length)

        try:
            pdu_type, body = read_pdu()
            if pdu_type != 0x01:
                return
            called, calling, contexts, max_pdu = parse_associate(body)
            results = []
            transfer_by_ctx = {}
            known = set(STORAGE_SOP_CLASSES) | {VERIFICATION_SOP}
            abstract_by_ctx = {}
            for ctx_id, _r, abstract, transfers in contexts:
                ts = next(
                    (t for t in (EXPLICIT_VR_LE, IMPLICIT_VR_LE) if t in transfers),
                    None,
                )
                if abstract in known and ts:
                    results.append((ctx_id, 0, ts))
                    transfer_by_ctx[ctx_id] = ts
                    abstract_by_ctx[ctx_id] = abstract
                else:
                    results.append((ctx_id, 3, transfers[0] if transfers else IMPLICIT_VR_LE))
            sock.sendall(encode_associate_ac(calling, called, results))

            command = bytearray()
            dataset = bytearray()
            while True:
                pdu_type, body = read_pdu()
                if pdu_type == 0x05:  # release
                    sock.sendall(_pdu(0x06, b"\x00" * 4))
                    return
                if pdu_type == 0x07:
                    return
                if pdu_type != 0x04:
                    return
                pos = 0
                while pos < len(body):
                    (n,) = struct.unpack(">I", body[pos : pos + 4])
                    ctx_id = body[pos + 4]
                    header = body[pos + 5]
                    frag = body[pos + 6 : pos + 4 + n]
                    if header & 0x01:
                        command += frag
                        if header & 0x02:
                            cmd = decode_command(bytes(command))
                            command = bytearray()
                            field = struct.unpack("<H", cmd[(0x0000, 0x0100)][:2])[0]
                            msg_id = struct.unpack("<H", cmd[(0x0000, 0x0110)][:2])[0]
                            if field == 0x0030:  # C-ECHO
                                for pdu in encode_pdata(
                                    ctx_id, c_echo_rsp(msg_id), True, max_pdu
                                ):
                                    sock.sendall(pdu)
                            elif field == 0x0001:  # C-STORE: dataset follows
                                self._pending = (ctx_id, cmd, msg_id)
                    else:
                        dataset += frag
                        if header & 0x02:
                            ctx, cmd, msg_id = self._pending
                            explicit = transfer_by_ctx.get(ctx) == EXPLICIT_VR_LE
                            sop_class = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
                            sop_inst = cmd[(0x0000, 0x1000)].rstrip(b"\x00").decode()
                            status = server.store(bytes(dataset), sop_class,
                                                  sop_inst, explicit)
                            dataset = bytearray()
                            for pdu in encode_pdata(
                                ctx, c_store_rsp(sop_class, sop_inst, msg_id, status),
                                True, max_pdu,
                            ):
                                sock.sendall(pdu)
                    pos += 4 + n
        except ConnectionError:
            pass
        except Exception:  # pragma: no cover - defensive
            logger.exception("SCP handler error")


class StorageSCP(socketserver.ThreadingTCPServer):
    """Verification + Storage SCP writing received instances to a directory
    (the reference's ``connector.listen``, reference connector.py:373-394)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, host: str = "0.0.0.0", port: int = 11112,
                 output_directory: str = ".", on_store=None):
        super().__init__((host, port), _SCPHandler)
        self.output_directory = Path(output_directory)
        self.output_directory.mkdir(parents=True, exist_ok=True)
        self.on_store = on_store
        self.received: List[str] = []

    def store(self, dataset_bytes: bytes, sop_class: str, sop_instance: str,
              explicit: bool) -> int:
        try:
            from platipy_tpu.dicom.io.dataset import write_file

            ds = read_dataset(dataset_bytes, explicit=explicit)
            series = ds.get((0x0020, 0x000E))
            subdir = self.output_directory / (
                series.value if series is not None else "unknown-series"
            )
            subdir.mkdir(parents=True, exist_ok=True)
            path = str(subdir / f"{sop_instance}.dcm")
            write_file(path, ds, sop_class, sop_instance)
            self.received.append(path)
            if self.on_store:
                self.on_store(path, ds)
            return 0x0000
        except Exception:
            logger.exception("failed to store %s", sop_instance)
            return 0xA700

    def start_background(self) -> threading.Thread:
        thread = threading.Thread(target=self.serve_forever, daemon=True)
        thread.start()
        return thread


# -- C-FIND / C-MOVE SCU --------------------------------------------------------

FIND_STUDY_ROOT = "1.2.840.10008.5.1.4.1.2.2.1"
FIND_PATIENT_ROOT = "1.2.840.10008.5.1.4.1.2.1.1"
MOVE_STUDY_ROOT = "1.2.840.10008.5.1.4.1.2.2.2"
MOVE_PATIENT_ROOT = "1.2.840.10008.5.1.4.1.2.1.2"


def _encode_identifier(identifier: Dict, explicit: bool = True) -> bytes:
    """Encode a query identifier dict {(g,e): Element|str} in the accepted
    transfer syntax — sending explicit VR on an implicit-accepted context
    makes the SCP read the VR bytes as length and garbage the query."""
    from platipy_tpu.dicom.io.dataset import _encode_value

    body = bytearray()
    for tag in sorted(identifier):
        el = identifier[tag]
        if not isinstance(el, Element):
            el = Element(b"UI" if tag in ((0x0020, 0x000D), (0x0020, 0x000E)) else b"LO",
                         el)
        if explicit:
            _write_element(body, tag, el)
        else:
            raw = _encode_value(el.vr, el.value)  # already even-padded
            body += struct.pack("<HH", tag[0], tag[1])
            body += struct.pack("<I", len(raw))
            body += raw
    return bytes(body)


def c_find(host: str, port: int, identifier: Dict, query_model: str = "S",
           calling: str = "PLATIPYTPU", called: str = "ANYSCP",
           timeout: float = 60.0) -> List[Dict]:
    """Query SCU (the reference's ``connector.do_find``, connector.py:85-133):
    returns the list of matching identifier datasets."""
    sop = FIND_STUDY_ROOT if query_model.upper().startswith("S") else FIND_PATIENT_ROOT
    assoc = Association(host, port, calling, called,
                        [(sop, [EXPLICIT_VR_LE, IMPLICIT_VR_LE])], timeout=timeout)
    matches = []
    try:
        ctx = assoc.context_for(sop)
        explicit = assoc.accepted[ctx] == EXPLICIT_VR_LE
        cmd = _encode_command({
            (0x0000, 0x0002): _ui(sop),
            (0x0000, 0x0100): _us(0x0020),
            (0x0000, 0x0110): _us(1),
            (0x0000, 0x0700): _us(0x0002),
            (0x0000, 0x0800): _us(0x0000),
        })
        assoc.send_dimse(ctx, cmd, _encode_identifier(identifier, explicit))
        while True:
            _, cmd_raw, data = assoc.recv_dimse()
            rsp = decode_command(cmd_raw)
            status = struct.unpack("<H", rsp[(0x0000, 0x0900)][:2])[0]
            if data:
                matches.append(read_dataset(data, explicit=explicit))
            if status not in (0xFF00, 0xFF01):  # pending
                break
    finally:
        assoc.release()
    return matches


def c_move(host: str, port: int, identifier: Dict, move_destination: str,
           query_model: str = "S", calling: str = "PLATIPYTPU",
           called: str = "ANYSCP", timeout: float = 300.0) -> Dict[str, int]:
    """Retrieve SCU (the reference's ``connector.move_series``,
    connector.py:134-165): asks the SCP to C-STORE the matches to
    ``move_destination`` (an AE title — typically this host's listener)."""
    sop = MOVE_STUDY_ROOT if query_model.upper().startswith("S") else MOVE_PATIENT_ROOT
    assoc = Association(host, port, calling, called,
                        [(sop, [EXPLICIT_VR_LE, IMPLICIT_VR_LE])], timeout=timeout)
    try:
        ctx = assoc.context_for(sop)
        explicit = assoc.accepted[ctx] == EXPLICIT_VR_LE
        cmd = _encode_command({
            (0x0000, 0x0002): _ui(sop),
            (0x0000, 0x0100): _us(0x0021),
            (0x0000, 0x0110): _us(1),
            (0x0000, 0x0600): move_destination.encode("ascii"),
            (0x0000, 0x0700): _us(0x0002),
            (0x0000, 0x0800): _us(0x0000),
        })
        assoc.send_dimse(ctx, cmd, _encode_identifier(identifier, explicit))
        counts = {"completed": 0, "failed": 0, "warning": 0}
        while True:
            _, cmd_raw, _data = assoc.recv_dimse()
            rsp = decode_command(cmd_raw)
            status = struct.unpack("<H", rsp[(0x0000, 0x0900)][:2])[0]
            for key, tag in (("completed", 0x1021), ("failed", 0x1022),
                             ("warning", 0x1023)):
                raw = rsp.get((0x0000, tag))
                if raw:
                    counts[key] = struct.unpack("<H", raw[:2])[0]
            if status not in (0xFF00, 0xFF01):
                break
        return counts
    finally:
        assoc.release()
