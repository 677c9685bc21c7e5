"""Posting-block codec: delta-gap + varint (north rule's physical
posting format).

Block layout (bytes):
    varint n_entries
    n_entries x (varint docid_ordinal_gap, varint value)

Ordinals are global, assigned in docid sort order (ordinals.py), so gaps
are small and varints average 1-2 bytes. The first entry's gap is taken
from ``base_ord`` (the block's range start), keeping every block
independently decodable.

The same (gap, value) stream encodes BOTH segment payload kinds:
posting blocks carry value = tf_raw per (term, doc) entry, and the
per-(field, block) doc-length blocks carry value = doc_len once per
document (codec v2; segments.build_len_blocks). Codec v1 interleaved
doc_len into every posting entry — a per-document value repeated once
per distinct term in the doc, the largest avoidable byte stream in the
segment store at 10^12 turns (~1-2 varint bytes x postings_rows); v2
stores it once per (field, doc) in the side table instead.

Encode/decode run inside Arrow-batched pandas UDFs over
*already-grouped* arrays (one call per posting block). The block codec
is numpy-vectorized — byte lengths, shifts, and continuation bits are
computed for the whole interleaved (gap, value) stream in a handful of
array passes (≤10 for 64-bit values) instead of a Python loop per
varint; at ~11 postings/turn x 2 varints each, the scalar loop was the
dominant cost of the segment-encode stage. The scalar
``encode_varint``/``decode_varint`` remain as the format reference
(tests pin the vectorized paths against them).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def encode_varint(value: int, out: bytearray) -> None:
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _encode_varints(vals: np.ndarray) -> np.ndarray:
    """Vectorized LEB128: uint64 values -> concatenated varint bytes."""
    v = vals.astype(np.uint64, copy=False)
    n = len(v)
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += tmp > 0
        tmp >>= np.uint64(7)
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    pos = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=pos[1:])
    cur = v.copy()
    k = 0
    while True:
        mask = nb > k
        if not mask.any():
            break
        b = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (nb[mask] > k + 1).astype(np.uint8)
        out[pos[mask] + k] = b | (more << 7)
        cur >>= np.uint64(7)
        k += 1
    return out


def _decode_varints(buf: bytes) -> np.ndarray:
    """Vectorized LEB128: concatenated varint bytes -> uint64 values."""
    a = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(a < 128)
    n = len(ends)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = a[starts].astype(np.uint64) & np.uint64(0x7F)
    for j in range(1, int(lens.max()) if n else 0):
        m = lens > j
        vals[m] |= (a[starts[m] + j].astype(np.uint64)
                    & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals


def encode_block(ords: List[int], vals: List[int],
                 base_ord: int = 0) -> bytes:
    """Encode parallel (sorted ordinal, value) lists. ``ords`` MUST
    be strictly increasing. value = tf_raw for posting blocks, doc_len
    for len blocks."""
    n = len(ords)
    if n == 0:
        out = bytearray()
        encode_varint(0, out)
        return bytes(out)
    o = np.asarray(ords, dtype=np.int64)
    inter = np.empty(2 * n + 1, dtype=np.uint64)
    inter[0] = n
    inter[1] = o[0] - base_ord
    inter[3::2] = np.diff(o).astype(np.uint64)
    inter[2::2] = np.asarray(vals, dtype=np.uint64)
    return _encode_varints(inter).tobytes()


def decode_block_arrays(buf: bytes, base_ord: int = 0):
    """-> (ords, vals) as int64 numpy arrays — the allocation-light
    decode for vectorized consumers (the per-element .tolist()
    round-trip of ``decode_block`` is pure overhead when the caller
    immediately re-wraps the lists in arrays)."""
    vals = _decode_varints(buf)
    n = int(vals[0]) if len(vals) else 0
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    body = vals[1:1 + 2 * n]
    ords = np.cumsum(body[0::2].astype(np.int64)) + base_ord
    return ords, body[1::2].astype(np.int64)


def decode_block(buf: bytes, base_ord: int = 0):
    """-> (ords, vals) as plain int lists."""
    ords, vals = decode_block_arrays(buf, base_ord)
    return ords.tolist(), vals.tolist()
