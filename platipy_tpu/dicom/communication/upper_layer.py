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


def _role_item(uid: str, scu_role: int, scp_role: int) -> bytes:
    """SCP/SCU role selection sub-item (PS3.7 D.3.3.4): the C-GET SCU uses it
    to negotiate acting as the storage SCP on its own association."""
    raw = _uid_bytes(uid)
    return _item(0x54, struct.pack(">H", len(raw)) + raw
                 + bytes([scu_role, scp_role]))


def encode_associate_rq(calling: str, called: str,
                        contexts: List[Tuple[int, str, List[str]]],
                        max_pdu: int = 65536,
                        roles: Optional[Dict[str, Tuple[int, int]]] = None) -> bytes:
    body = struct.pack(">HH", 1, 0) + _pad_ae(called) + _pad_ae(calling) + b"\x00" * 32
    body += _item(0x10, _uid_bytes(APPLICATION_CONTEXT))
    for ctx_id, abstract, transfers in contexts:
        sub = struct.pack(">BBBB", ctx_id, 0, 0, 0)
        sub += _item(0x30, _uid_bytes(abstract))
        for ts in transfers:
            sub += _item(0x40, _uid_bytes(ts))
        body += _item(0x20, sub)
    user = _item(0x51, struct.pack(">I", max_pdu))
    for uid, (scu_role, scp_role) in (roles or {}).items():
        user += _role_item(uid, scu_role, scp_role)
    body += _item(0x50, user)
    return _pdu(0x01, body)


def encode_associate_ac(calling: str, called: str,
                        results: List[Tuple[int, int, str]],
                        max_pdu: int = 65536,
                        roles: Optional[Dict[str, Tuple[int, int]]] = None) -> bytes:
    """results: (ctx_id, result 0=accept/3+=reject, transfer_syntax)."""
    body = struct.pack(">HH", 1, 0) + _pad_ae(called) + _pad_ae(calling) + b"\x00" * 32
    body += _item(0x10, _uid_bytes(APPLICATION_CONTEXT))
    for ctx_id, result, ts in results:
        sub = struct.pack(">BBBB", ctx_id, 0, result, 0)
        sub += _item(0x40, _uid_bytes(ts))
        body += _item(0x21, sub)
    user = _item(0x51, struct.pack(">I", max_pdu))
    for uid, (scu_role, scp_role) in (roles or {}).items():
        user += _role_item(uid, scu_role, scp_role)
    body += _item(0x50, user)
    return _pdu(0x02, body)


def _parse_items(body: bytes):
    pos = 0
    while pos + 4 <= len(body):
        t, _, n = struct.unpack(">BBH", body[pos : pos + 4])
        yield t, body[pos + 4 : pos + 4 + n]
        pos += 4 + n


def parse_associate(body: bytes, with_roles: bool = False):
    """Parse RQ or AC body -> (called, calling, contexts, max_pdu[, roles]).

    contexts: list of (ctx_id, result_or_0, abstract_or_None, [transfers]).
    roles (when requested): {abstract_syntax: (scu_role, scp_role)} from
    SCP/SCU role-selection sub-items.
    """
    called = body[4:20].decode("ascii").strip()
    calling = body[20:36].decode("ascii").strip()
    contexts = []
    max_pdu = 16384
    roles: Dict[str, Tuple[int, int]] = {}
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
                elif st == 0x54 and len(sub) >= 4:
                    (uid_len,) = struct.unpack(">H", sub[:2])
                    if len(sub) < 4 + uid_len:
                        # truncated/malformed role item: the two role bytes
                        # after the UID are absent — skip rather than IndexError
                        logger.warning("truncated SCP/SCU role item (len %d, "
                                       "uid_len %d)", len(sub), uid_len)
                        continue
                    uid = sub[2 : 2 + uid_len].rstrip(b"\x00").decode("ascii")
                    roles[uid] = (sub[2 + uid_len], sub[3 + uid_len])
    if with_roles:
        return called, calling, contexts, max_pdu, roles
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


def _qr_rsp(sop_class: str, field: int, message_id: int, status: int,
            counts: Optional[Dict[str, int]] = None,
            has_data: bool = False) -> bytes:
    """C-FIND/C-GET/C-MOVE response command set; ``counts`` carries the
    remaining/completed/failed/warning sub-operation counters (PS3.7 9.1)."""
    elements = {
        (0x0000, 0x0002): _ui(sop_class),
        (0x0000, 0x0100): _us(field),
        (0x0000, 0x0120): _us(message_id),
        (0x0000, 0x0800): _us(0x0000 if has_data else 0x0101),
        (0x0000, 0x0900): _us(status),
    }
    for key, tag in (("remaining", 0x1020), ("completed", 0x1021),
                     ("failed", 0x1022), ("warning", 0x1023)):
        if counts is not None and key in counts:
            elements[(0x0000, tag)] = _us(counts[key])
    return _encode_command(elements)


# -- association (SCU side) ----------------------------------------------------


class ReleaseRequested(ConnectionError):
    """Peer sent A-RELEASE-RQ while a DIMSE message was awaited.

    A ``ConnectionError`` subclass so callers whose error contract is "the
    exchange did not complete" (``DicomConnector.verify``/``send_dcm``
    catch ``ConnectionError``) degrade to their failure return instead of
    crashing when a peer releases mid-exchange."""


class _DimseTransport:
    """Shared P-DATA machinery over an established association socket —
    used by the SCU :class:`Association` and the server-side handler (the
    C-GET SCP interleaves full DIMSE exchanges both ways on one socket)."""

    sock: socket.socket
    max_pdu: int

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
            if pdu_type == 0x05:
                raise ReleaseRequested()
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


class Association(_DimseTransport):
    """One SCU association: connect, negotiate, exchange DIMSE, release."""

    def __init__(self, host: str, port: int, calling: str, called: str,
                 contexts: List[Tuple[str, List[str]]], timeout: float = 30.0,
                 roles: Optional[Dict[str, Tuple[int, int]]] = None):
        """``roles``: optional SCP/SCU role-selection proposals
        {abstract_syntax: (scu_role, scp_role)} — the C-GET SCU proposes
        (0, 1) for every storage SOP class it is willing to receive
        (PS3.4 C.5.3)."""
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.max_pdu = 65536
        numbered = [
            (1 + 2 * i, abstract, transfers)
            for i, (abstract, transfers) in enumerate(contexts)
        ]
        self.sock.sendall(encode_associate_rq(calling, called, numbered,
                                              roles=roles))
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


class _ServerAssociation(_DimseTransport):
    """Server side of one accepted association."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.max_pdu = 65536
        self.transfer_by_ctx: Dict[int, str] = {}
        self.abstract_by_ctx: Dict[int, str] = {}
        self.peer_roles: Dict[str, Tuple[int, int]] = {}

    def accept(self, known: set) -> bool:
        """Read A-ASSOCIATE-RQ and answer AC; returns False on bad open."""
        pdu_type, body = self._read_pdu()
        if pdu_type != 0x01:
            return False
        called, calling, contexts, peer_max, peer_roles = parse_associate(
            body, with_roles=True
        )
        self.max_pdu = peer_max
        self.peer_roles = peer_roles
        results = []
        for ctx_id, _r, abstract, transfers in contexts:
            ts = next(
                (t for t in (EXPLICIT_VR_LE, IMPLICIT_VR_LE) if t in transfers),
                None,
            )
            if abstract in known and ts:
                results.append((ctx_id, 0, ts))
                self.transfer_by_ctx[ctx_id] = ts
                self.abstract_by_ctx[ctx_id] = abstract
            else:
                results.append(
                    (ctx_id, 3, transfers[0] if transfers else IMPLICIT_VR_LE)
                )
        # accept the peer's role proposals verbatim (a C-GET SCU proposes
        # scu=0/scp=1 on storage classes: it will receive our C-STOREs)
        self.sock.sendall(
            encode_associate_ac(calling, called, results, roles=peer_roles)
        )
        return True

    def context_for_abstract(self, abstract: str) -> Optional[int]:
        for ctx_id, a in self.abstract_by_ctx.items():
            if a == abstract:
                return ctx_id
        return None

    def explicit(self, ctx_id: int) -> bool:
        return self.transfer_by_ctx.get(ctx_id) == EXPLICIT_VR_LE


class _SCPHandler(socketserver.BaseRequestHandler):
    def handle(self):  # noqa: C901 - protocol state machine
        server: StorageSCP = self.server  # type: ignore[assignment]
        assoc = _ServerAssociation(self.request)
        try:
            if not assoc.accept(server.supported_sops()):
                return
            while True:
                try:
                    ctx_id, cmd_raw, data = assoc.recv_dimse()
                except ReleaseRequested:
                    assoc.sock.sendall(_pdu(0x06, b"\x00" * 4))
                    return
                cmd = decode_command(cmd_raw)
                field = struct.unpack("<H", cmd[(0x0000, 0x0100)][:2])[0]
                msg_id = struct.unpack("<H", cmd[(0x0000, 0x0110)][:2])[0]
                if field == 0x0030:  # C-ECHO
                    assoc.send_dimse(ctx_id, c_echo_rsp(msg_id))
                elif field == 0x0001:  # C-STORE
                    sop_class = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
                    sop_inst = cmd[(0x0000, 0x1000)].rstrip(b"\x00").decode()
                    status = server.store(
                        data, sop_class, sop_inst, assoc.explicit(ctx_id)
                    )
                    assoc.send_dimse(
                        ctx_id, c_store_rsp(sop_class, sop_inst, msg_id, status)
                    )
                elif field == 0x0020:  # C-FIND
                    server.handle_find(assoc, ctx_id, cmd, msg_id, data)
                elif field == 0x0010:  # C-GET
                    server.handle_get(assoc, ctx_id, cmd, msg_id, data)
                elif field == 0x0021:  # C-MOVE
                    server.handle_move(assoc, ctx_id, cmd, msg_id, data)
                else:
                    logger.warning("unsupported DIMSE field 0x%04x", field)
        except ConnectionError:
            pass
        except Exception:  # pragma: no cover - defensive
            logger.exception("SCP handler error")


def _store_dataset_to_dir(dataset_bytes: bytes, sop_class: str,
                          sop_instance: str, explicit: bool,
                          output_directory: Path, on_store=None):
    """Write a received dataset under ``output_directory/<SeriesUID>/`` as a
    part-10 file; returns (DIMSE status, path or None)."""
    try:
        from platipy_tpu.dicom.io.dataset import write_file

        ds = read_dataset(dataset_bytes, explicit=explicit)
        series = ds.get((0x0020, 0x000E))
        subdir = Path(output_directory) / (
            series.value if series is not None else "unknown-series"
        )
        subdir.mkdir(parents=True, exist_ok=True)
        path = str(subdir / f"{sop_instance}.dcm")
        write_file(path, ds, sop_class, sop_instance)
        if on_store:
            on_store(path, ds)
        return 0x0000, path
    except Exception:
        logger.exception("failed to store %s", sop_instance)
        return 0xA700, None


def _encode_dataset(ds: Dict, explicit: bool) -> bytes:
    """Encode a {tag: Element} dataset (group 0002 skipped) in the
    association-negotiated transfer syntax."""
    from platipy_tpu.dicom.io.dataset import _encode_value

    body = bytearray()
    for t in sorted(k for k in ds.keys() if k[0] != 0x0002):
        el = ds[t]
        if explicit:
            _write_element(body, t, el)
        else:
            raw = _encode_value(el.vr, el.value)
            body += struct.pack("<HHI", t[0], t[1], len(raw)) + raw
    return bytes(body)


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

    def supported_sops(self) -> set:
        return set(STORAGE_SOP_CLASSES) | {VERIFICATION_SOP}

    def store(self, dataset_bytes: bytes, sop_class: str, sop_instance: str,
              explicit: bool) -> int:
        status, path = _store_dataset_to_dir(
            dataset_bytes, sop_class, sop_instance, explicit,
            self.output_directory, self.on_store,
        )
        if path:
            self.received.append(path)
        return status

    # Q/R services are refused at association time (supported_sops); these
    # exist so a subclass can enable them (QueryRetrieveSCP below).
    def handle_find(self, assoc, ctx_id, cmd, msg_id, data):
        sop = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
        assoc.send_dimse(ctx_id, _qr_rsp(sop, 0x8020, msg_id, 0xC000))

    def handle_get(self, assoc, ctx_id, cmd, msg_id, data):
        sop = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
        assoc.send_dimse(ctx_id, _qr_rsp(sop, 0x8010, msg_id, 0xC000))

    def handle_move(self, assoc, ctx_id, cmd, msg_id, data):
        sop = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
        assoc.send_dimse(ctx_id, _qr_rsp(sop, 0x8021, msg_id, 0xC000))

    def start_background(self) -> threading.Thread:
        thread = threading.Thread(target=self.serve_forever, daemon=True)
        thread.start()
        return thread


FIND_STUDY_ROOT = "1.2.840.10008.5.1.4.1.2.2.1"
FIND_PATIENT_ROOT = "1.2.840.10008.5.1.4.1.2.1.1"
MOVE_STUDY_ROOT = "1.2.840.10008.5.1.4.1.2.2.2"
MOVE_PATIENT_ROOT = "1.2.840.10008.5.1.4.1.2.1.2"
GET_STUDY_ROOT = "1.2.840.10008.5.1.4.1.2.2.3"
GET_PATIENT_ROOT = "1.2.840.10008.5.1.4.1.2.1.3"

QR_SOP_CLASSES = [FIND_STUDY_ROOT, FIND_PATIENT_ROOT, MOVE_STUDY_ROOT,
                  MOVE_PATIENT_ROOT, GET_STUDY_ROOT, GET_PATIENT_ROOT]

# identifier keys the Q/R SCP matches on (PS3.4 C.6: the hierarchical
# search keys the reference's retrieval flow uses)
_QR_MATCH_KEYS = [
    (0x0010, 0x0020),  # PatientID
    (0x0020, 0x000D),  # StudyInstanceUID
    (0x0020, 0x000E),  # SeriesInstanceUID
    (0x0008, 0x0018),  # SOPInstanceUID
    (0x0008, 0x0060),  # Modality
]


class QueryRetrieveSCP(StorageSCP):
    """Query/Retrieve + Storage SCP: serves C-FIND, C-GET (interleaved
    C-STORE sub-operations on the requesting association) and C-MOVE from a
    directory of part-10 files.

    The reference exercises these services against an external PACS
    (reference connector.py:85-308); this class provides the server side
    natively so the full retrieval flows round-trip in-process.
    ``move_destinations`` maps AE titles to ``(host, port)`` — the
    configuration a real PACS keeps for C-MOVE destinations.
    """

    def __init__(self, host: str = "0.0.0.0", port: int = 11112,
                 serve_directory: str = ".", output_directory: str = None,
                 move_destinations: Optional[Dict[str, Tuple[str, int]]] = None,
                 on_store=None, ae_title: str = "PLATIPYTPUQR"):
        super().__init__(host, port,
                         output_directory=output_directory or serve_directory,
                         on_store=on_store)
        self.serve_directory = Path(serve_directory)
        self.move_destinations = dict(move_destinations or {})
        self.ae_title = ae_title
        self._index: List[Tuple[str, Dict]] = []
        self.reindex()

    def supported_sops(self) -> set:
        return super().supported_sops() | set(QR_SOP_CLASSES)

    def reindex(self) -> int:
        """(Re)scan ``serve_directory`` for part-10 files."""
        from platipy_tpu.dicom.io.dataset import read_file

        self._index = []
        for path in sorted(self.serve_directory.rglob("*.dcm")):
            try:
                self._index.append((str(path), read_file(str(path))))
            except Exception:
                logger.warning("unreadable DICOM file skipped: %s", path)
        return len(self._index)

    def _matches(self, identifier: Dict) -> List[Tuple[str, Dict]]:
        out = []
        for path, ds in self._index:
            ok = True
            for tag in _QR_MATCH_KEYS:
                el = identifier.get(tag)
                want = getattr(el, "value", el)
                if want in (None, "", "*"):
                    continue
                have = ds.get(tag)
                if have is None or str(have.value).strip() != str(want).strip():
                    ok = False
                    break
            if ok:
                out.append((path, ds))
        return out

    def handle_find(self, assoc, ctx_id, cmd, msg_id, data):
        sop = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
        explicit = assoc.explicit(ctx_id)
        identifier = read_dataset(data, explicit=explicit)
        level_el = identifier.get((0x0008, 0x0052))
        level = str(level_el.value).strip() if level_el is not None else "SERIES"
        seen = set()
        for _path, ds in self._matches(identifier):
            # one response per unique entity at the query level
            key_tag = {
                "PATIENT": (0x0010, 0x0020),
                "STUDY": (0x0020, 0x000D),
                "SERIES": (0x0020, 0x000E),
                "IMAGE": (0x0008, 0x0018),
            }.get(level.upper(), (0x0020, 0x000E))
            key_el = ds.get(key_tag)
            key = key_el.value if key_el is not None else _path
            if key in seen:
                continue
            seen.add(key)
            # echo the request's return keys, filled from the matched file
            rsp_ds = {}
            for tag, el in identifier.items():
                have = ds.get(tag)
                rsp_ds[tag] = have if have is not None else el
            for tag in (key_tag, (0x0008, 0x0052)):
                if tag not in rsp_ds:
                    src = ds.get(tag) or identifier.get(tag)
                    if src is not None:
                        rsp_ds[tag] = src
            assoc.send_dimse(
                ctx_id,
                _qr_rsp(sop, 0x8020, msg_id, 0xFF00, has_data=True),
                _encode_dataset(rsp_ds, explicit),
            )
        assoc.send_dimse(ctx_id, _qr_rsp(sop, 0x8020, msg_id, 0x0000))

    def _store_files_over(self, assoc, files, send_ctx_lookup, counts,
                          sop, rsp_field, ctx_id, msg_id):
        """Send each file as a C-STORE sub-operation; update ``counts`` and
        emit a pending response after each (PS3.4 C.4.3)."""
        for path, ds in files:
            sop_class = ds[(0x0008, 0x0016)].value
            sop_inst = ds[(0x0008, 0x0018)].value
            store_ctx = send_ctx_lookup(sop_class)
            if store_ctx is None:
                logger.warning("no storage context for %s; sub-op failed",
                               sop_class)
                counts["failed"] += 1
            else:
                status = self._send_one_store(assoc, store_ctx, sop_class,
                                              sop_inst, ds)
                counts["completed" if status == 0 else "failed"] += 1
            counts["remaining"] -= 1
            assoc.send_dimse(
                ctx_id, _qr_rsp(sop, rsp_field, msg_id, 0xFF00, counts)
            )

    def handle_get(self, assoc, ctx_id, cmd, msg_id, data):
        """C-GET: C-STORE sub-operations interleave on the SAME association
        (the requester negotiated the storage SCP role)."""
        sop = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
        identifier = read_dataset(data, explicit=assoc.explicit(ctx_id))
        files = self._matches(identifier)
        counts = {"remaining": len(files), "completed": 0, "failed": 0,
                  "warning": 0}

        def ctx_lookup(sop_class):
            c = assoc.context_for_abstract(sop_class)
            # the peer must have negotiated itself into the SCP role for
            # this storage class; be lenient if it sent no role items
            if c is not None and self_roles_ok(assoc, sop_class):
                return c
            return None

        def self_roles_ok(a, sop_class):
            role = a.peer_roles.get(sop_class)
            return role is None or role[1] == 1  # peer offered SCP role

        self._store_files_over(assoc, files, ctx_lookup, counts, sop,
                               0x8010, ctx_id, msg_id)
        final = 0x0000 if counts["failed"] == 0 else 0xB000
        assoc.send_dimse(ctx_id, _qr_rsp(sop, 0x8010, msg_id, final, counts))

    def _send_one_store(self, assoc, store_ctx, sop_class, sop_inst, ds) -> int:
        body = _encode_dataset(ds, assoc.explicit(store_ctx))
        assoc.send_dimse(store_ctx, c_store_rq(sop_class, sop_inst), body)
        _, rsp_raw, _ = assoc.recv_dimse()
        rsp = decode_command(rsp_raw)
        return struct.unpack("<H", rsp.get((0x0000, 0x0900), b"\xff\xff")[:2])[0]

    def handle_move(self, assoc, ctx_id, cmd, msg_id, data):
        """C-MOVE: C-STORE the matches to the destination AE over a NEW
        association (looked up in ``move_destinations``)."""
        sop = cmd[(0x0000, 0x0002)].rstrip(b"\x00").decode()
        dest_aet = cmd.get((0x0000, 0x0600), b"").rstrip(b"\x00 ").decode()
        identifier = read_dataset(data, explicit=assoc.explicit(ctx_id))
        files = self._matches(identifier)
        dest = self.move_destinations.get(dest_aet)
        if dest is None:
            logger.warning("C-MOVE destination %r unknown", dest_aet)
            assoc.send_dimse(
                ctx_id, _qr_rsp(sop, 0x8021, msg_id, 0xA801)  # unknown dest
            )
            return
        counts = {"remaining": len(files), "completed": 0, "failed": 0,
                  "warning": 0}
        sop_classes = sorted({ds[(0x0008, 0x0016)].value for _p, ds in files})
        try:
            sub = Association(
                dest[0], dest[1], calling=self.ae_title, called=dest_aet,
                contexts=[(sc, [EXPLICIT_VR_LE, IMPLICIT_VR_LE])
                          for sc in sop_classes] or
                         [(VERIFICATION_SOP, [IMPLICIT_VR_LE])],
            )
        except (ConnectionError, OSError) as exc:
            # destination registered but unreachable: answer the requester
            # with a failed C-MOVE-RSP instead of dropping the association
            logger.warning("C-MOVE destination %r unreachable: %s",
                           dest_aet, exc)
            counts["failed"] = len(files)
            counts["remaining"] = 0
            assoc.send_dimse(
                ctx_id, _qr_rsp(sop, 0x8021, msg_id, 0xA801, counts=counts)
            )
            return
        try:
            def ctx_lookup(sop_class):
                try:
                    return sub.context_for(sop_class)
                except KeyError:
                    return None

            for path, ds in files:
                sop_class = ds[(0x0008, 0x0016)].value
                sop_inst = ds[(0x0008, 0x0018)].value
                store_ctx = ctx_lookup(sop_class)
                if store_ctx is None:
                    counts["failed"] += 1
                else:
                    body = _encode_dataset(
                        ds, sub.accepted[store_ctx] == EXPLICIT_VR_LE
                    )
                    sub.send_dimse(store_ctx, c_store_rq(sop_class, sop_inst),
                                   body)
                    _, rsp_raw, _ = sub.recv_dimse()
                    rsp = decode_command(rsp_raw)
                    st = struct.unpack(
                        "<H", rsp.get((0x0000, 0x0900), b"\xff\xff")[:2]
                    )[0]
                    counts["completed" if st == 0 else "failed"] += 1
                counts["remaining"] -= 1
                assoc.send_dimse(
                    ctx_id, _qr_rsp(sop, 0x8021, msg_id, 0xFF00, counts)
                )
        finally:
            sub.release()
        final = 0x0000 if counts["failed"] == 0 else 0xB000
        assoc.send_dimse(ctx_id, _qr_rsp(sop, 0x8021, msg_id, final, counts))


# -- C-FIND / C-MOVE / C-GET SCU ------------------------------------------------


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


def c_get(host: str, port: int, identifier: Dict, output_directory,
          query_model: str = "S", calling: str = "PLATIPYTPU",
          called: str = "ANYSCP", timeout: float = 300.0,
          on_store=None) -> Tuple[Dict[str, int], List[str]]:
    """Retrieve SCU via C-GET (the reference's ``connector.download_series``,
    reference connector.py:166-308): the SCP's C-STORE sub-operations arrive
    interleaved on THIS association — this SCU negotiates the storage SCP
    role (PS3.4 C.5.3) and answers each store inline.

    Returns (sub-operation counts, list of stored file paths).
    """
    sop = GET_STUDY_ROOT if query_model.upper().startswith("S") else GET_PATIENT_ROOT
    contexts = [(sop, [EXPLICIT_VR_LE, IMPLICIT_VR_LE])] + [
        (sc, [EXPLICIT_VR_LE, IMPLICIT_VR_LE]) for sc in STORAGE_SOP_CLASSES
    ]
    roles = {sc: (0, 1) for sc in STORAGE_SOP_CLASSES}
    assoc = Association(host, port, calling, called, contexts,
                        timeout=timeout, roles=roles)
    out_dir = Path(output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)
    counts = {"remaining": 0, "completed": 0, "failed": 0, "warning": 0}
    paths: List[str] = []
    try:
        ctx = assoc.context_for(sop)
        explicit = assoc.accepted[ctx] == EXPLICIT_VR_LE
        cmd = _encode_command({
            (0x0000, 0x0002): _ui(sop),
            (0x0000, 0x0100): _us(0x0010),
            (0x0000, 0x0110): _us(1),
            (0x0000, 0x0700): _us(0x0002),
            (0x0000, 0x0800): _us(0x0000),
        })
        assoc.send_dimse(ctx, cmd, _encode_identifier(identifier, explicit))
        while True:
            ctx_id, cmd_raw, data = assoc.recv_dimse()
            rsp = decode_command(cmd_raw)
            field = struct.unpack("<H", rsp[(0x0000, 0x0100)][:2])[0]
            if field == 0x0001:  # interleaved C-STORE-RQ from the SCP
                sop_class = rsp[(0x0000, 0x0002)].rstrip(b"\x00").decode()
                sop_inst = rsp[(0x0000, 0x1000)].rstrip(b"\x00").decode()
                sub_msg_id = struct.unpack("<H", rsp[(0x0000, 0x0110)][:2])[0]
                store_explicit = assoc.accepted.get(ctx_id) == EXPLICIT_VR_LE
                status, path = _store_dataset_to_dir(
                    data, sop_class, sop_inst, store_explicit, out_dir, on_store
                )
                if path:
                    paths.append(path)
                assoc.send_dimse(
                    ctx_id, c_store_rsp(sop_class, sop_inst, sub_msg_id, status)
                )
            elif field == 0x8010:  # C-GET-RSP
                status = struct.unpack("<H", rsp[(0x0000, 0x0900)][:2])[0]
                for key, tag in (("remaining", 0x1020), ("completed", 0x1021),
                                 ("failed", 0x1022), ("warning", 0x1023)):
                    raw = rsp.get((0x0000, tag))
                    if raw:
                        counts[key] = struct.unpack("<H", raw[:2])[0]
                if status not in (0xFF00, 0xFF01):
                    break
            else:
                logger.warning("unexpected DIMSE field 0x%04x during C-GET",
                               field)
    finally:
        assoc.release()
    return counts, paths
