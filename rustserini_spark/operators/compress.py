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


def _varint_nbytes(v: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count: max(1, ceil(bit_length/7))."""
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    return np.maximum(1, (nbits + 6) // 7)


def varint_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode (vectorized over byte positions); also returns per-value
    byte sizes so callers can slice the buffer at value boundaries."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = _varint_nbytes(v)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[offsets[mask] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_sizes(values)[0]


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


def decode_blocks_batch(
    bufs: list[bytes], ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY blocks in one vectorized pass.

    Varints end on value boundaries, so the concatenation of block buffers
    decodes as one stream; per-block docid cumsums are recovered with the
    segmented-cumsum trick (global cumsum minus the value at each segment
    start). Returns (doc_ids, tfs, dls, block_idx) flat arrays where block_idx
    maps each posting back to its input block row. This is the query-path
    decode: one NumPy pass per Arrow batch instead of a Python loop per block.
    """
    ns = np.asarray(ns, dtype=np.int64)
    if len(bufs) == 0 or ns.sum() == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    vals = varint_decode(b"".join(bufs))
    total = int(ns.sum())
    assert vals.size == 3 * total, f"expected {3*total} varints, got {vals.size}"

    # value layout per block: [deltas(n) tfs(n) dls(n)]
    block_val_starts = np.concatenate(([0], np.cumsum(3 * ns)[:-1]))
    idx = np.arange(total)
    block_idx = np.repeat(np.arange(ns.size), ns)
    within = idx - np.repeat(np.concatenate(([0], np.cumsum(ns)[:-1])), ns)
    delta_pos = block_val_starts[block_idx] + within
    deltas = vals[delta_pos].astype(np.int64)
    tfs = vals[delta_pos + ns[block_idx]].astype(np.int64)
    dls = vals[delta_pos + 2 * ns[block_idx]].astype(np.int64)

    # segmented cumsum: global cumsum minus its value just before each segment
    g = np.cumsum(deltas)
    seg_starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
    g_before = np.concatenate(([0], g[:-1]))[seg_starts]
    doc_ids = g - np.repeat(g_before, ns)
    return doc_ids, tfs, dls, block_idx


def bm25_impact(tf: np.ndarray, dl: np.ndarray, idf: float, k1: float, b: float, avgdl: float) -> np.ndarray:
    """Per-posting BM25 score contribution (Lucene BM25Similarity shape):
    idf * tf / (tf + k1 * (1 - b + b * dl/avgdl)). float64 internally.
    """
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_group_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    idf: float,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE_DEFAULT,
) -> dict[str, list]:
    """Encode one posting (sub)list into blocks in a single vectorized pass.

    All per-posting math (impact, deltas, varint byte sizes) runs over the
    whole group at once; block boundaries are recovered by slicing the single
    encoded buffer at per-value byte offsets. Per-block cost is two slices,
    not a NumPy pipeline — at web scale the encode stage runs millions of
    blocks, and per-block NumPy fixed costs were the build bottleneck.

    Output format per block is unchanged: varint(deltas) ++ varint(tfs) ++
    varint(dls), first delta absolute.
    """
    order = np.argsort(doc_ids, kind="stable")
    d = np.asarray(doc_ids)[order]
    t = np.asarray(tfs)[order]
    l = np.asarray(dls)[order]
    n = d.size
    starts = np.arange(0, n, block_size)
    ends = np.minimum(starts + block_size, n)
    n_blocks = starts.size

    imp = bm25_impact(t, l, idf, k1, b, avgdl)
    max_imp = np.maximum.reduceat(imp, starts)

    deltas = np.diff(d, prepend=0)
    deltas[starts] = d[starts]  # first delta in each block is absolute

    # interleaved per-block layout: [deltas_b, tfs_b, dls_b] x blocks
    parts = []
    for i in range(n_blocks):
        s, e = starts[i], ends[i]
        parts.append(deltas[s:e])
        parts.append(t[s:e])
        parts.append(l[s:e])
    vals = np.concatenate(parts).astype(np.uint64)
    buf, sizes = varint_encode_with_sizes(vals)
    byte_ends = np.cumsum(sizes)

    lens = ends - starts
    val_ends = np.cumsum(3 * lens)  # value-index end per block
    block_byte_ends = byte_ends[val_ends - 1]
    block_byte_starts = np.concatenate(([0], block_byte_ends[:-1]))

    return {
        "block_seq": list(range(n_blocks)),
        "first_doc": d[starts].tolist(),
        "last_doc": d[ends - 1].tolist(),
        "n_docs": lens.tolist(),
        "max_impact": max_imp.tolist(),
        "postings_bin": [
            buf[block_byte_starts[i] : block_byte_ends[i]] for i in range(n_blocks)
        ],
    }


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
    """Row-dict view over encode_group_blocks (kept for tests/callers that
    want per-block dicts)."""
    cols = encode_group_blocks(doc_ids, tfs, dls, idf, k1, b, avgdl, block_size)
    for i in range(len(cols["block_seq"])):
        yield {k: cols[k][i] for k in cols}
