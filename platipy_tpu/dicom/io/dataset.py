"""Minimal pure-Python DICOM dataset codec.

The reference uses pydicom (absent in this environment), so the framework
carries its own reader/writer for the subset of DICOM it needs: little-endian
implicit/explicit VR, nested sequences, pixel data — enough for CT/MR/PT
series, RTSTRUCT, and RTDOSE (reference call sites: platipy/dicom/io/*).

A dataset is a dict mapping (group, element) tags to ``Element(vr, value)``.
Values are decoded per VR: numeric arrays for binary VRs, str/list for text,
list of datasets for SQ, raw bytes for pixel data.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

__all__ = ["Element", "read_dataset", "read_file", "write_file", "Tag", "generate_uid"]

Tag = Tuple[int, int]

_EXPLICIT_LONG_VRS = {b"OB", b"OW", b"OF", b"OD", b"OL", b"SQ", b"UT", b"UN", b"UC", b"UR"}
_BINARY_VR_FMT = {
    b"US": ("<H", 2), b"SS": ("<h", 2), b"UL": ("<I", 4), b"SL": ("<i", 4),
    b"FL": ("<f", 4), b"FD": ("<d", 8), b"AT": ("<I", 4),
}
_STRING_VRS = {b"AE", b"AS", b"CS", b"DA", b"DS", b"DT", b"IS", b"LO", b"LT",
               b"PN", b"SH", b"ST", b"TM", b"UI", b"UT", b"UC", b"UR"}

# implicit-VR dictionary for the tags the converters touch (fallback: UN)
_IMPLICIT_VR = {
    (0x0002, 0x0010): b"UI",
    (0x0008, 0x0005): b"CS", (0x0008, 0x0008): b"CS", (0x0008, 0x0016): b"UI",
    (0x0008, 0x0018): b"UI", (0x0008, 0x0020): b"DA", (0x0008, 0x0021): b"DA",
    (0x0008, 0x0022): b"DA", (0x0008, 0x0023): b"DA",
    (0x0008, 0x0030): b"TM", (0x0008, 0x0031): b"TM", (0x0008, 0x0032): b"TM",
    (0x0008, 0x0033): b"TM", (0x0008, 0x0050): b"SH", (0x0008, 0x0060): b"CS",
    (0x0008, 0x0070): b"LO", (0x0008, 0x0080): b"LO", (0x0008, 0x0090): b"PN",
    (0x0008, 0x103E): b"LO", (0x0008, 0x1030): b"LO",
    (0x0008, 0x1150): b"UI", (0x0008, 0x1155): b"UI",
    (0x0010, 0x0010): b"PN", (0x0010, 0x0020): b"LO", (0x0010, 0x0030): b"DA",
    (0x0010, 0x0040): b"CS",
    (0x0018, 0x0050): b"DS", (0x0018, 0x5100): b"CS",
    (0x0020, 0x000D): b"UI", (0x0020, 0x000E): b"UI", (0x0020, 0x0010): b"SH",
    (0x0020, 0x0011): b"IS", (0x0020, 0x0013): b"IS", (0x0020, 0x0032): b"DS",
    (0x0020, 0x0037): b"DS", (0x0020, 0x0052): b"UI", (0x0020, 0x1041): b"DS",
    (0x0028, 0x0002): b"US", (0x0028, 0x0004): b"CS", (0x0028, 0x0008): b"IS",
    (0x0028, 0x0009): b"AT",
    (0x0028, 0x0010): b"US", (0x0028, 0x0011): b"US", (0x0028, 0x0030): b"DS",
    (0x0028, 0x0100): b"US", (0x0028, 0x0101): b"US", (0x0028, 0x0102): b"US",
    (0x0028, 0x0103): b"US", (0x0028, 0x1052): b"DS", (0x0028, 0x1053): b"DS",
    (0x0028, 0x1054): b"LO",
    # PT SUV scaling chain (series.get_suv_bw_scale_factor); without these an
    # implicit-VR PT series (default transfer syntax) decodes them as UN raw
    # bytes and SUV conversion silently never applies
    (0x0010, 0x1030): b"DS",
    (0x0018, 0x0088): b"DS",
    (0x0018, 0x1072): b"TM", (0x0018, 0x1074): b"DS", (0x0018, 0x1075): b"DS",
    (0x0018, 0x1078): b"DT",
    (0x0054, 0x0016): b"SQ", (0x0054, 0x1001): b"CS",
    (0x7053, 0x1000): b"DS",
    (0x3004, 0x0002): b"CS", (0x3004, 0x0004): b"CS", (0x3004, 0x000A): b"CS",
    (0x3004, 0x000C): b"DS", (0x3004, 0x000E): b"DS",
    (0x3006, 0x0002): b"SH", (0x3006, 0x0004): b"LO", (0x3006, 0x0008): b"DA",
    (0x3006, 0x0009): b"TM",
    (0x3006, 0x0010): b"SQ", (0x3006, 0x0012): b"SQ", (0x3006, 0x0014): b"SQ",
    (0x3006, 0x0016): b"SQ", (0x3006, 0x0020): b"SQ", (0x3006, 0x0022): b"IS",
    (0x3006, 0x0024): b"UI", (0x3006, 0x0026): b"LO", (0x3006, 0x0028): b"ST",
    (0x3006, 0x002A): b"IS", (0x3006, 0x0036): b"CS",
    (0x3006, 0x0039): b"SQ", (0x3006, 0x0040): b"SQ", (0x3006, 0x0042): b"CS",
    (0x3006, 0x0046): b"IS", (0x3006, 0x0050): b"DS", (0x3006, 0x0080): b"SQ",
    (0x3006, 0x0082): b"IS", (0x3006, 0x0084): b"IS", (0x3006, 0x0085): b"SH",
    (0x3006, 0x00A4): b"CS", (0x3006, 0x00A6): b"PN",
    (0x300C, 0x0060): b"SQ", (0x300C, 0x0002): b"SQ",
    (0x7FE0, 0x0010): b"OW",
}

_ROOT_UID = "1.2.826.0.1.3680043.10.1487."  # framework UID root (generated)


def generate_uid() -> str:
    import random
    import time

    suffix = f"{int(time.time() * 1e6)}{random.randint(100, 999)}"
    return (_ROOT_UID + suffix)[:64]


@dataclass
class Element:
    vr: bytes
    value: object

    def __repr__(self):
        v = self.value
        if isinstance(v, bytes) and len(v) > 32:
            v = f"<{len(v)} bytes>"
        return f"Element({self.vr.decode()}, {v!r})"


def _decode_value(vr: bytes, raw: bytes):
    if vr in _BINARY_VR_FMT:
        fmt, size = _BINARY_VR_FMT[vr]
        n = len(raw) // size
        vals = [struct.unpack_from(fmt, raw, i * size)[0] for i in range(n)]
        return vals[0] if n == 1 else vals
    if vr in _STRING_VRS:
        text = raw.decode("latin-1").rstrip("\x00 ").strip()
        if vr in (b"DS",):
            if text == "":
                return []
            # keep empty components as "" — dropping them would SHIFT every
            # later value (ContourData triplets become misaligned garbage);
            # rtstruct_to_nifti.fix_missing_data repairs them downstream
            vals = [float(p.strip()) if p.strip() != "" else ""
                    for p in text.split("\\")]
            return vals[0] if len(vals) == 1 else vals
        if vr in (b"IS",):
            if text == "":
                return []
            vals = [int(float(p.strip())) if p.strip() != "" else ""
                    for p in text.split("\\")]
            return vals[0] if len(vals) == 1 else vals
        if "\\" in text:
            return text.split("\\")
        return text
    return raw  # OB/OW/UN etc: raw bytes


def _read_element(buf: memoryview, pos: int, explicit: bool):
    group, elem = struct.unpack_from("<HH", buf, pos)
    pos += 4
    tag = (group, elem)

    if tag == (0xFFFE, 0xE000) or tag == (0xFFFE, 0xE00D) or tag == (0xFFFE, 0xE0DD):
        length = struct.unpack_from("<I", buf, pos)[0]
        return tag, b"__ITEM__", length, pos + 4

    if explicit:
        vr = bytes(buf[pos : pos + 2])
        pos += 2
        if vr in _EXPLICIT_LONG_VRS:
            pos += 2  # reserved
            length = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            length = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
    else:
        vr = _IMPLICIT_VR.get(tag, b"UN")
        length = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
    return tag, vr, length, pos


def _read_sequence(buf: memoryview, pos: int, length: int, explicit: bool):
    items = []
    end = pos + length if length != 0xFFFFFFFF else len(buf)
    while pos < end:
        tag, _, ilen, pos = _read_element(buf, pos, explicit)
        if tag == (0xFFFE, 0xE0DD):  # sequence delimiter
            break
        if tag != (0xFFFE, 0xE000):
            raise ValueError(f"expected item tag in sequence, got {tag}")
        item, pos = _read_dataset_region(
            buf, pos, pos + ilen if ilen != 0xFFFFFFFF else end, explicit,
            stop_at_item_delim=(ilen == 0xFFFFFFFF),
        )
        items.append(item)
        if length != 0xFFFFFFFF and pos >= end:
            break
    return items, pos


def _read_dataset_region(buf: memoryview, pos: int, end: int, explicit: bool,
                         stop_at_item_delim: bool = False):
    ds: Dict[Tag, Element] = {}
    while pos < end:
        tag, vr, length, pos = _read_element(buf, pos, explicit)
        if stop_at_item_delim and tag == (0xFFFE, 0xE00D):
            break
        if vr == b"SQ" or (vr in (b"UN",) and length == 0xFFFFFFFF):
            items, pos = _read_sequence(buf, pos, length, explicit)
            ds[tag] = Element(b"SQ", items)
            continue
        if length == 0xFFFFFFFF:
            raise ValueError(f"undefined length on non-SQ tag {tag}")
        raw = bytes(buf[pos : pos + length])
        pos += length
        ds[tag] = Element(vr, _decode_value(vr, raw))
    return ds, pos


def read_dataset(data: bytes, explicit: bool) -> Dict[Tag, Element]:
    ds, _ = _read_dataset_region(memoryview(data), 0, len(data), explicit)
    return ds


def read_file(path: str) -> Dict[Tag, Element]:
    """Read a DICOM part-10 file (little-endian transfer syntaxes)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[128:132] != b"DICM":
        # some files omit the preamble; try reading as raw dataset
        try:
            return read_dataset(data, explicit=True)
        except Exception:
            return read_dataset(data, explicit=False)

    buf = memoryview(data)
    pos = 132
    # file meta group: always explicit VR LE; read elements while group==0002
    meta: Dict[Tag, Element] = {}
    while pos < len(data):
        group = struct.unpack_from("<H", buf, pos)[0]
        if group != 0x0002:
            break
        tag, vr, length, pos = _read_element(buf, pos, explicit=True)
        raw = bytes(buf[pos : pos + length])
        pos += length
        meta[tag] = Element(vr, _decode_value(vr, raw))

    ts = meta.get((0x0002, 0x0010))
    transfer_syntax = ts.value if ts else "1.2.840.10008.1.2.1"
    if transfer_syntax == "1.2.840.10008.1.2":
        explicit = False
    elif transfer_syntax in ("1.2.840.10008.1.2.1", "1.2.840.10008.1.2.1.99"):
        explicit = True
    else:
        raise NotImplementedError(
            f"Unsupported transfer syntax {transfer_syntax} (compressed pixel data)"
        )

    ds, _ = _read_dataset_region(buf, pos, len(data), explicit)
    ds.update(meta)
    return ds


# ---------------------------------------------------------------------------
# writer (explicit VR little endian)
# ---------------------------------------------------------------------------

def _ds_str(v: float) -> str:
    """Decimal string in <= 16 bytes (the DS limit) at the best precision
    that fits — "%g" alone truncates geometry to 6 significant digits, which
    drifts coordinates on every store/forward hop."""
    for digits in range(16, 5, -1):
        text = f"{v:.{digits}g}"
        if len(text) <= 16:
            return text
    return f"{v:.6g}"


def _encode_value(vr: bytes, value) -> bytes:
    if vr in _BINARY_VR_FMT:
        fmt, _ = _BINARY_VR_FMT[vr]
        vals = value if isinstance(value, (list, tuple)) else [value]
        return b"".join(struct.pack(fmt, int(v) if vr not in (b"FL", b"FD") else float(v))
                        for v in vals)
    if vr in _STRING_VRS:
        if isinstance(value, (list, tuple)):
            if vr == b"DS":
                text = "\\".join(
                    "" if v == "" else _ds_str(float(v)) for v in value
                )
            elif vr == b"IS":
                text = "\\".join(
                    "" if v == "" else str(int(v)) for v in value
                )
            else:
                text = "\\".join(str(v) for v in value)
        else:
            if vr == b"DS" and isinstance(value, float):
                text = _ds_str(value)
            else:
                text = str(value)
        raw = text.encode("latin-1")
        if len(raw) % 2:
            raw += b"\x00" if vr == b"UI" else b" "
        return raw
    raw = bytes(value)
    if len(raw) % 2:
        raw += b"\x00"
    return raw


def _write_element(out: bytearray, tag: Tag, el: Element):
    if el.vr == b"SQ":
        body = bytearray()
        for item in el.value:
            item_body = bytearray()
            for t in sorted(item.keys()):
                _write_element(item_body, t, item[t])
            body += struct.pack("<HHI", 0xFFFE, 0xE000, len(item_body))
            body += item_body
        out += struct.pack("<HH", *tag)
        out += b"SQ\x00\x00"
        out += struct.pack("<I", len(body))
        out += body
        return

    raw = _encode_value(el.vr, el.value)
    out += struct.pack("<HH", *tag)
    if el.vr in _EXPLICIT_LONG_VRS:
        out += el.vr + b"\x00\x00" + struct.pack("<I", len(raw))
    else:
        out += el.vr + struct.pack("<H", len(raw))
    out += raw


def write_file(path: str, ds: Dict[Tag, Element], sop_class_uid: str,
               sop_instance_uid: str):
    """Write a DICOM part-10 file (explicit VR little endian)."""
    meta: Dict[Tag, Element] = {
        (0x0002, 0x0001): Element(b"OB", b"\x00\x01"),
        (0x0002, 0x0002): Element(b"UI", sop_class_uid),
        (0x0002, 0x0003): Element(b"UI", sop_instance_uid),
        (0x0002, 0x0010): Element(b"UI", "1.2.840.10008.1.2.1"),
        (0x0002, 0x0012): Element(b"UI", _ROOT_UID.rstrip(".")),
    }
    meta_body = bytearray()
    for t in sorted(meta.keys()):
        _write_element(meta_body, t, meta[t])

    out = bytearray(b"\x00" * 128 + b"DICM")
    # group length element (0002,0000)
    out += struct.pack("<HH", 0x0002, 0x0000) + b"UL" + struct.pack("<H", 4)
    out += struct.pack("<I", len(meta_body))
    out += meta_body

    body = bytearray()
    for t in sorted(k for k in ds.keys() if k[0] != 0x0002):
        _write_element(body, t, ds[t])
    out += body

    with open(path, "wb") as f:
        f.write(bytes(out))
