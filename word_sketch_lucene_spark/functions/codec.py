"""Delta + VByte posting-list codec (numpy-vectorized, no per-value Python).

Reference parity: BlackLab's varint token codec
(``README.md:744-752``: ``[count][Δpos][len][utf8]…``, ~30 GB vs ~80 GB
uncompressed at 62 M sentences). Here the same idea compresses posting
lists inside index segments: doc-id *gaps* and position *gaps* are
VByte-packed (7 data bits/byte, MSB = continuation).

These kernels run inside ``mapInPandas`` on executors over Arrow
batches — encoding is O(total bytes) numpy work, never per-row Python.
"""

from __future__ import annotations

import numpy as np

_MAX_VBYTE_LEN = 10  # 64 bits / 7


def vbyte_encode(values: np.ndarray) -> bytes:
    """VByte-encode a non-negative int array (vectorized).

    Layout per value: little-endian 7-bit groups; MSB set on every byte
    except the last of a value.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    n = v.size
    # (n, 10) matrix of 7-bit groups
    shifts = (np.uint64(7) * np.arange(_MAX_VBYTE_LEN, dtype=np.uint64))[None, :]
    groups = (v[:, None] >> shifts) & np.uint64(0x7F)
    # bytes needed per value: index of highest nonzero group + 1 (min 1)
    nonzero = groups != 0
    lengths = np.maximum(
        1, _MAX_VBYTE_LEN - np.argmax(nonzero[:, ::-1], axis=1)
    )
    lengths = np.where(nonzero.any(axis=1), lengths, 1)
    # continuation bit on all but the last byte of each value
    col = np.arange(_MAX_VBYTE_LEN)[None, :]
    keep = col < lengths[:, None]
    cont = col < (lengths[:, None] - 1)
    out = (groups | (cont.astype(np.uint64) << np.uint64(7))).astype(np.uint8)
    return out[keep].tobytes()


_VBYTE_BINS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count (vectorized) — for slicing a single
    concatenated VByte stream into per-group spans without re-encoding."""
    v = np.asarray(values, dtype=np.uint64)
    return (np.digitize(v, _VBYTE_BINS) + 1).astype(np.int64)


def vbyte_decode(buf: bytes) -> np.ndarray:
    """Decode a VByte stream back to uint64 values (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    value_idx_lengths = ends - starts + 1
    # offset of each byte within its value
    offsets = np.arange(b.size) - np.repeat(starts, value_idx_lengths)
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * offsets.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_vals: np.ndarray, first_delta_from: int = 0) -> np.ndarray:
    """Ascending ints → gaps (first gap relative to ``first_delta_from``)."""
    a = np.asarray(sorted_vals, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    out = np.empty_like(a)
    out[0] = a[0] - first_delta_from
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out.astype(np.uint64)


def delta_decode(gaps: np.ndarray, first_delta_from: int = 0) -> np.ndarray:
    """Inverse of :func:`delta_encode`."""
    g = np.asarray(gaps, dtype=np.uint64).astype(np.int64)
    if g.size == 0:
        return g
    out = np.cumsum(g)
    return out + first_delta_from


def encode_positions(position_lists: list[np.ndarray]) -> bytes:
    """Concatenated per-doc position lists: VByte([len, Δpos…] per doc)."""
    parts: list[np.ndarray] = []
    for pl in position_lists:
        pl = np.asarray(pl, dtype=np.int64)
        parts.append(np.concatenate([[pl.size], delta_encode(pl)]).astype(np.uint64))
    if not parts:
        return b""
    return vbyte_encode(np.concatenate(parts))


def decode_positions(buf: bytes, n_docs: int) -> list[np.ndarray]:
    """Inverse of :func:`encode_positions` → list of ascending position arrays."""
    flat = vbyte_decode(buf).astype(np.int64)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        ln = int(flat[i])
        i += 1
        out.append(delta_decode(flat[i : i + ln].astype(np.uint64)))
        i += ln
    return out
