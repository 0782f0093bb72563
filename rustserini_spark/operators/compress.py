"""Delta-gap + varint posting compression and block-max metadata (NumPy-vectorized).

Reference parity target (SURVEY.md §2 O8/O10): Lucene stores postings delta-gap +
VInt encoded in blocks with block-max impact metadata (BMW); the reference consumes
that format opaquely via JNI (/root/reference/src/searcher/lucene/index.rs:57-58).
This module owns the same on-disk semantics natively: postings live in BinaryType
columns, one row per (term, salt, block), each block carrying its docid range and a
precomputed BM25 score upper bound (``max_impact``) so query-time pruning can skip
whole blocks without decoding them.

Everything here is pure NumPy (no Python-per-value loops on the decode path) so it
runs Arrow-batch-at-a-time inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE_DEFAULT = 128


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array (vectorized over byte positions)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum(1, (nbits + 6) // 7)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[offsets[mask] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    grp = np.cumsum(np.concatenate(([False], is_last[:-1])))
    pos = np.arange(b.size) - starts[grp]
    shifted = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.bitwise_or.reduceat(shifted, starts)


def encode_posting_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """One block: varint(delta(doc_ids)) ++ varint(tfs) ++ varint(dls).

    ``doc_ids`` must be sorted ascending and distinct within the block; the first
    delta is the absolute first doc_id.
    """
    deltas = np.diff(doc_ids, prepend=0).astype(np.uint64)
    return varint_encode(deltas) + varint_encode(tfs) + varint_encode(dls)


def decode_posting_block(buf: bytes, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    vals = varint_decode(buf)
    assert vals.size == 3 * n, f"expected {3*n} varints, got {vals.size}"
    doc_ids = np.cumsum(vals[:n].astype(np.int64))
    return doc_ids, vals[n : 2 * n].astype(np.int64), vals[2 * n :].astype(np.int64)


def bm25_impact(tf: np.ndarray, dl: np.ndarray, idf: float, k1: float, b: float, avgdl: float) -> np.ndarray:
    """Per-posting BM25 score contribution (Lucene BM25Similarity shape):
    idf * tf / (tf + k1 * (1 - b + b * dl/avgdl)). float64 internally.
    """
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def make_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    idf: float,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE_DEFAULT,
):
    """Split one sorted posting (sub)list into compressed blocks.

    Yields dicts: block_seq, first_doc, last_doc, n_docs, max_impact, postings_bin.
    """
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    n = doc_ids.size
    for seq, lo in enumerate(range(0, n, block_size)):
        hi = min(lo + block_size, n)
        d, t, l = doc_ids[lo:hi], tfs[lo:hi], dls[lo:hi]
        imp = bm25_impact(t, l, idf, k1, b, avgdl)
        yield {
            "block_seq": seq,
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "n_docs": int(hi - lo),
            "max_impact": float(imp.max()),
            "postings_bin": encode_posting_block(d, t, l),
        }
