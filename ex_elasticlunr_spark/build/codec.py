"""Posting-block codec: delta-gap + varint (north rule's physical
posting format).

Block layout (bytes):
    varint n_entries
    n_entries x (varint docid_ordinal_gap, varint tf_raw, varint doc_len)

Ordinals are global, assigned in docid sort order (ordinals.py), so gaps
are small and varints average 1-2 bytes. The first entry's gap is taken
from ``base_ord`` (the block's range start), keeping every block
independently decodable. doc_len rides along so BM25 scoring needs no
doc_stats join at query time (same denormalization as the postings
table).

Pure Python by design: encode/decode run inside Arrow-batched pandas
UDFs over *already-grouped* arrays (one call per posting block), so the
per-entry Python cost is amortized across the block.
"""

from __future__ import annotations

from typing import List, Tuple


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


def encode_block(ords: List[int], tfs: List[int], dls: List[int],
                 base_ord: int = 0) -> bytes:
    """Encode parallel (sorted ordinal, tf, doc_len) lists. ``ords`` MUST
    be strictly increasing."""
    out = bytearray()
    encode_varint(len(ords), out)
    prev = base_ord
    for o, tf, dl in zip(ords, tfs, dls):
        encode_varint(o - prev, out)
        encode_varint(tf, out)
        encode_varint(dl, out)
        prev = o
    return bytes(out)


def decode_block(buf: bytes, base_ord: int = 0):
    """-> (ords, tfs, dls)."""
    n, pos = decode_varint(buf, 0)
    ords: List[int] = []
    tfs: List[int] = []
    dls: List[int] = []
    prev = base_ord
    for _ in range(n):
        gap, pos = decode_varint(buf, pos)
        tf, pos = decode_varint(buf, pos)
        dl, pos = decode_varint(buf, pos)
        prev += gap
        ords.append(prev)
        tfs.append(tf)
        dls.append(dl)
    return ords, tfs, dls
