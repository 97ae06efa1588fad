"""Delta + varbyte posting-list codec with block-max metadata (pure numpy).

The index's physical format (north star: "delta-encoded, varbyte-compressed
blocks with per-block max-score metadata"). Everything here is vectorized
numpy — this code runs inside Arrow UDF workers on executor nodes, so a
Python-level loop per posting would dominate build time at scale.

Layout per (term, docID-range) segment row:
  * ``doc_ids`` — strictly ascending; stored as first-difference deltas
    (previous initialized to 0), varbyte.
  * ``tfs``, ``dls`` — raw values, varbyte. dl rides with each posting so
    scoring is self-contained (no doclen join/broadcast at 10^12 docs).
  * block metadata, one entry per ``block_size`` postings:
    ``block_last_doc`` (skip pointers), ``block_max_tf`` and
    ``block_min_dl``. The BM25 block upper bound is derived at QUERY
    time as idf·tnorm(max_tf, min_dl, current_avgdl): tnorm is monotone
    increasing in tf and decreasing in dl, so this dominates every
    member under ANY avgdl. Storing tnorm itself would bake in the
    build-time avgdl — a later incremental generation shifts the corpus
    avgdl and would silently invalidate the bound (wrong WAND pruning).
    idf is likewise applied at query time from current global df, so
    merges never invalidate block metadata.
"""

from __future__ import annotations

import numpy as np

from mee_spark.bm25 import tnorm_np
from mee_spark.config import BLOCK_SIZE

_SHIFTS = np.arange(10, dtype=np.uint64) * np.uint64(7)


def varbyte_encode_lens(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varbyte -> (uint8 byte stream, per-value byte counts).

    The per-value counts let a caller that encodes MANY posting runs in
    one pass slice the stream back into per-run blobs by offset — the
    whole-group encoder in segments.py does exactly that (round 7)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # number of 7-bit groups per value (>=1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(7)
        nz = tmp > 0
    nbytes = np.maximum(nbits, 1)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # byte j of value i = (v[i] >> 7j) & 0x7f, continuation bit unless last
    pos = np.arange(total, dtype=np.int64)
    owner = np.searchsorted(ends - 1, pos)  # which value each byte belongs to
    j = (pos - starts[owner]).astype(np.uint64)
    out[:] = ((v[owner] >> (j * np.uint64(7))) & np.uint64(0x7F)).astype(np.uint8)
    is_last = pos == (ends[owner] - 1)
    out[~is_last] |= 0x80
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte (LEB128-style: 7 data bits, MSB=continuation)."""
    out, _ = varbyte_encode_lens(values)
    return out.tobytes()


def varbyte_decode(blob: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    if not blob:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(blob, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    starts = np.empty(int(is_last.sum()), dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    pos_in_group = np.arange(raw.size, dtype=np.int64)
    group = np.searchsorted(ends, pos_in_group)
    j = (pos_in_group - starts[group]).astype(np.uint64)
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << (j * np.uint64(7))
    return np.add.reduceat(contrib, starts)


def delta_encode(doc_ids: np.ndarray) -> bytes:
    """Strictly-ascending doc_ids -> varbyte(first-differences)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return b""
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    return varbyte_encode(deltas)


def delta_decode(blob: bytes) -> np.ndarray:
    deltas = varbyte_decode(blob)
    return np.cumsum(deltas, dtype=np.uint64)


def block_metadata(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (block_last_doc int64[], block_max_tf int64[], block_min_dl int64[])."""
    n = len(doc_ids)
    n_blocks = (n + block_size - 1) // block_size
    last = np.asarray(doc_ids, dtype=np.int64)[
        np.minimum(np.arange(1, n_blocks + 1) * block_size - 1, n - 1)
    ]
    starts = np.arange(n_blocks) * block_size
    max_tf = np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), starts)
    min_dl = np.minimum.reduceat(np.asarray(dls, dtype=np.int64), starts)
    return last, max_tf, min_dl


def block_ub(max_tf: np.ndarray, min_dl: np.ndarray, avgdl: float,
             k1: float | None = None, b: float | None = None) -> np.ndarray:
    """Per-block tnorm upper bound under the CURRENT corpus avgdl."""
    kwargs = {}
    if k1 is not None:
        kwargs["k1"] = k1
    if b is not None:
        kwargs["b"] = b
    return tnorm_np(np.asarray(max_tf), np.asarray(min_dl), avgdl, **kwargs)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Full segment-row payload for one (term, range) posting run."""
    last, max_tf, min_dl = block_metadata(doc_ids, tfs, dls, block_size)
    return {
        "doc_ids_blob": delta_encode(doc_ids),
        "tfs_blob": varbyte_encode(np.asarray(tfs, dtype=np.uint64)),
        "dls_blob": varbyte_encode(np.asarray(dls, dtype=np.uint64)),
        "block_last_doc": last.tolist(),
        "block_max_tf": max_tf.tolist(),
        "block_min_dl": min_dl.tolist(),
        "n_postings": int(len(doc_ids)),
    }


def decode_postings(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segment row (mapping or object with blob fields) -> (docs, tfs, dls)."""
    get = row.get if hasattr(row, "get") else lambda k: getattr(row, k)
    docs = delta_decode(bytes(get("doc_ids_blob"))).astype(np.int64)
    tfs = varbyte_decode(bytes(get("tfs_blob"))).astype(np.int64)
    dls = varbyte_decode(bytes(get("dls_blob"))).astype(np.int64)
    return docs, tfs, dls
