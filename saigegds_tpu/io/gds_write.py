"""Minimal CoreArray GDS writer (SAIGE_OUTPUT association results).

The reference writes association tables to GDS containers with
``FileFormat="SAIGE_OUTPUT"`` / ``"SAIGE_OUTPUT_SET"`` (R/assoc_single.r:252,
R/assoc_aggregate.r:206) and reads them back via ``seqSAIGE_LoadPval``.
This writer emits the same container layout our reader (``io/gds.py``)
parses: uncompressed array nodes under a root folder, one block per node.
Supported column classes: dInt32, dFloat64, dVStr8 (LEB128 strings).

The byte-level property patterns mirror the constants reverse-engineered in
``io/gds.py`` (_PROPS) — write what we can read.
"""

from __future__ import annotations

import struct
from typing import Dict, List

import numpy as np

GDS_MAGIC = b"COREARRAYx0A"


def _u48(v: int) -> bytes:
    return int(v).to_bytes(6, "little")


def _pack7(name: str) -> bytes:
    """[len:1] + 7-bit packed chars (inverse of gds.py _unpack7)."""
    v = 0
    for i, ch in enumerate(name):
        v |= (ord(ch) & 0x7F) << (7 * i)
    nbytes = (7 * len(name) + 7) // 8
    return bytes([len(name)]) + v.to_bytes(nbytes, "little")


# property tag bytes (see io/gds.py _PROPS)
_P_NCHILD = bytes.fromhex("08c643754ef601")
_P_DIRENT = bytes.fromhex("01c7437517e57d")
_P_NATTR = bytes.fromhex("0807f37d9d937d")
_P_ATTR = bytes.fromhex("0108f37ddd45791f")
_P_NDIM = bytes.fromhex("07c4e3641f")
_P_DIMS = bytes.fromhex("02c34361")
_P_DATABLK = bytes.fromhex("09c4c37c0c")
_P_EID = bytes.fromhex("0902f500")
_P_EFLAG = bytes.fromhex("0944743112")
_P_ENAME = bytes.fromhex("1544c66010")


def _tds_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return bytes([0x0E, len(b)]) + b


def _attr_rec(attrs: Dict[str, str]) -> bytes:
    out = bytearray()
    for k, v in attrs.items():
        kb = k.encode("utf-8")
        out += bytes([len(kb)]) + kb + _tds_str(v)
    return bytes(out)


def _leb128(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_column(arr: np.ndarray):
    """-> (classname, payload bytes, n)"""
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        payload = bytearray()
        for s in arr:
            b = ("" if s is None else str(s)).encode("utf-8")
            payload += _leb128(len(b)) + b
        return "dVStr8", bytes(payload), len(arr)
    if arr.dtype.kind in ("i", "u"):
        a = np.asarray(arr, "<i4")
        return "dInt32", a.tobytes(), len(a)
    if arr.dtype.kind == "b":
        a = np.asarray(arr, "<i4")
        return "dInt32", a.tobytes(), len(a)
    a = np.asarray(arr, "<f8")
    return "dFloat64", a.tobytes(), len(a)


def _array_node_record(cls: str, n: int, data_bid: int) -> bytes:
    props = bytearray()
    props += _P_NDIM + struct.pack("<H", 1)
    props += _P_DIMS + bytes([4]) + struct.pack("<I", n)
    props += _P_DATABLK + struct.pack("<I", data_bid)
    body = bytearray()
    body += struct.pack("<H", 3)              # nprops
    body += struct.pack("<H", 0x0100)         # class version
    body += _pack7(cls)
    body += props
    return _u48(len(body) + 6) + bytes(body)


def _folder_node_record(children: List[tuple], attrs: Dict[str, str]) -> bytes:
    """children: [(name, bid)]"""
    ents = bytearray()
    for name, bid in children:
        nb = name.encode("utf-8")
        p = bytearray()
        p += _P_EID + struct.pack("<I", bid)
        p += _P_EFLAG + struct.pack("<I", 0)
        p += _P_ENAME + bytes([len(nb)]) + nb
        ents += _u48(len(p) + 8) + struct.pack("<H", 3) + p
    props = bytearray()
    nprops = 0
    if attrs:
        rec = _attr_rec(attrs)
        props += _P_NATTR + struct.pack("<I", len(attrs))
        props += _P_ATTR + _u48(len(rec) + 6) + rec
        nprops += 2
    props += _P_NCHILD + struct.pack("<I", len(children))
    props += _P_DIRENT + _u48(len(ents) + 6) + bytes(ents)
    nprops += 2
    body = struct.pack("<H", nprops) + bytes(props)
    return _u48(len(body) + 6) + body


def write_gds_table(path: str, columns: Dict[str, np.ndarray],
                    file_format: str = "SAIGE_OUTPUT"):
    """Write a flat table as a SAIGE_OUTPUT-style GDS file."""
    blocks: Dict[int, bytes] = {}
    children = []
    next_bid = 2
    for name, arr in columns.items():
        cls, payload, n = _encode_column(np.asarray(arr))
        data_bid = next_bid + 1
        blocks[next_bid] = _array_node_record(cls, n, data_bid)
        blocks[data_bid] = payload
        children.append((name, next_bid))
        next_bid += 2
    blocks[1] = _folder_node_record(children, {"FileFormat": file_format})

    with open(path, "wb") as f:
        f.write(GDS_MAGIC)
        f.write(struct.pack("<H", 0x0100))    # version
        f.write(b"\x00" * 4)                  # entry word (root = block 1)
        for bid, content in sorted(blocks.items()):
            piece = bytearray()
            size = 22 + len(content)
            piece += (size | (1 << 47)).to_bytes(6, "little")
            piece += _u48(0)                  # no continuation
            piece += struct.pack("<I", bid)
            piece += _u48(len(content))
            piece += content
            f.write(piece)


def save_assoc_gds(df, path: str, file_format: str = "SAIGE_OUTPUT"):
    """Save an association result DataFrame as a SAIGE_OUTPUT GDS."""
    cols = {k: df[k].to_numpy() for k in df.columns}
    write_gds_table(path, cols, file_format=file_format)
