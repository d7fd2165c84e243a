"""Benchmark decontamination: flag corpus documents that share any
n-token shingle with an evaluation set — the standard pre-training
hygiene pass (remove eval contamination before training).

EXACT by construction: candidate shingles are prefiltered with a
broadcast Bloom filter (no false negatives) and then verified by an
exact string-equality cogroup, so the result is identical to the
brute-force n-gram intersection — the Bloom stage only cuts exchange
volume (at 100 TB the corpus side ships ~(true matches + FP-rate)
instead of every shingle).

Shapes: shingle explode is fully vectorized (one
``split_pattern`` + one ``binary_join_element_wise`` over shifted
flat-token slices per block — no per-row Python); blocks dedupe
(doc, shingle) locally before anything ships; each (doc, shingle)
pair meets the eval set in exactly one bucket, so per-bucket hit
counts are disjoint and the final per-doc sum is a skinny exchange.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_PAIR = pa.schema([("doc_id", pa.int64()), ("s", pa.large_string())])
_EVAL = pa.schema([("s", pa.large_string())])
_HITS = pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])


def _shingle_arrays(text_col, n: int):
    """(shingle LargeStringArray, per-row shingle counts) for a block's
    text column; vectorized across rows."""
    import pyarrow.compute as pc

    col = text_col.combine_chunks() if isinstance(
        text_col, pa.ChunkedArray) else text_col
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    widths = np.diff(offs)
    wk = np.maximum(widths - (n - 1), 0)
    total = int(wk.sum())
    if total == 0:
        return pa.array([], pa.large_string()), wk
    flat = toks.values
    m = len(flat)
    parts = [flat.slice(j, m - (n - 1)) for j in range(n)]
    sh_all = pc.binary_join_element_wise(*parts, " ")
    base = np.repeat(offs[:-1], wk)
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(wk[:-1]))), wk)
    sh = sh_all.take(pa.array(base + within, pa.int64()))
    return sh.cast(pa.large_string()), wk


def _dedup_doc_shingles(batch: pa.Table, id_col: str, text_col: str,
                        n: int) -> pa.Table:
    """Block-local distinct (doc_id, shingle) rows."""
    if batch.num_rows == 0:
        return _PAIR.empty_table()
    sh, wk = _shingle_arrays(batch[text_col], n)
    if len(sh) == 0:
        return _PAIR.empty_table()
    ids = np.repeat(batch[id_col].to_numpy(
        zero_copy_only=False).astype(np.int64), wk)
    codes_arr = sh.dictionary_encode()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    pair, keep_idx = np.unique(np.stack([ids, codes], axis=1), axis=0,
                               return_index=True)
    take = pa.array(keep_idx, pa.int64())
    return pa.table({"doc_id": pair[:, 0], "s": sh.take(take)})


def decontaminate(docs, eval_docs, *, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 5,
                  nbuckets: int = 32, bloom_bits: int = 1 << 22):
    """Exact n-gram decontamination.

    Returns a Dataset ``(doc_id, n_hits)`` — one row per corpus
    document sharing >= 1 n-token shingle with ``eval_docs``;
    ``n_hits`` = number of DISTINCT shared shingles.
    """
    from .bloom import bloom_build, bloom_prefilter
    from .exchange import hash_cogroup, hash_exchange

    def doc_pairs(batch: pa.Table) -> pa.Table:
        return _dedup_doc_shingles(batch, id_col, text_col, n)

    def eval_shingles(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EVAL.empty_table()
        sh, _ = _shingle_arrays(batch[text_col], n)
        if len(sh) == 0:
            return _EVAL.empty_table()
        return pa.table({"s": sh.unique()})

    ev = eval_docs.map_batches(eval_shingles, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    bits_ref = __import__("ray").put(
        bloom_build(ev, "s", nbits=bloom_bits))

    cand = bloom_prefilter(
        docs.map_batches(doc_pairs, batch_format="pyarrow",
                         zero_copy_batch=True),
        "s", bits_ref, schema=_PAIR)

    def verify(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0 or right.num_rows == 0:
            return _HITS.empty_table()
        import pyarrow.compute as pc
        hit = pc.is_in(left["s"].combine_chunks(),
                       value_set=right["s"].combine_chunks().unique())
        mask = hit.to_numpy(zero_copy_only=False)
        ids = left["doc_id"].to_numpy(zero_copy_only=False)[mask]
        if ids.size == 0:
            return _HITS.empty_table()
        # cross-block duplicate (doc, shingle) pairs: dedupe by code
        codes = left["s"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)[mask]
        pairs = np.unique(np.stack([ids, codes], axis=1), axis=0)
        d, cnt = np.unique(pairs[:, 0], return_counts=True)
        return pa.table({"doc_id": d, "n_hits": cnt.astype(np.int64)})

    parts = hash_cogroup(cand, ev, nbuckets=nbuckets, left_on="s",
                         right_on="s", reduce_fn=verify,
                         left_schema=_PAIR, right_schema=_EVAL)

    def sum_hits(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _HITS.empty_table()
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        h = tbl["n_hits"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        return pa.table({
            "doc_id": ud,
            "n_hits": np.bincount(inv, weights=h).astype(np.int64)})

    return hash_exchange(parts, nbuckets=max(nbuckets // 4, 1),
                         on="doc_id", reduce_fn=sum_hits,
                         schema=_HITS)
