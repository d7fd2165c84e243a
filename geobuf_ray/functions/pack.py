"""Sequence packing — the LLM-pretraining data-layout step that turns
variable-length documents into fixed-size training sequences.

Two standard disciplines, both deterministic (docs are packed in
ascending id order within their group, so the output is independent
of partitioning):

* :func:`pack_concat_chunks` — GPT-style concatenate-and-split: the
  group's token stream is conceptually concatenated in id order and
  cut every ``chunk`` tokens; each document maps to its
  (start_chunk, start_offset, end_chunk) span.  Pure prefix-sum
  arithmetic -> exactly expressible as a SQL window, so the query
  hash-checks.
* :func:`pack_greedy` — next-fit whole-document packing: walk docs in
  id order, close the open bin whenever the next doc would overflow
  ``budget``.  A sequential recurrence, vectorized as a BOUNDARY WALK
  (one ``searchsorted`` into the group's prefix sums per emitted bin
  — O(#bins log n), never a per-row Python loop).

Partitioning assumption (documented per the brief): each group's rows
are co-located by one hash exchange on ``group_col`` and packed by a
vectorized kernel; a single group must fit one reduce task.  For
corpus-scale packing, pre-shard the corpus into deterministic id
ranges and use the shard id as the group.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import hash_exchange


def _group_sorted(tbl: pa.Table, group_col: str, id_col: str,
                  len_col: str):
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ln = tbl[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
    g = tbl[group_col].combine_chunks()
    gd = g.dictionary_encode()
    codes = gd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, codes))
    starts = np.concatenate(
        ([0], np.flatnonzero(codes[order][1:] != codes[order][:-1]) + 1))
    return order, starts, ids[order], ln[order], g.take(
        pa.array(order, pa.int64()))


def pack_concat_chunks(ds, *, id_col: str = "doc_id",
                       len_col: str = "n_chars",
                       group_col: str = "source",
                       chunk: int = 4096, nbuckets: int = 32):
    """Concatenate-and-split packing spans per document (see module
    docstring).  Returns a Dataset with (id, group, start_chunk,
    start_offset, end_chunk); lengths must be >= 1."""
    out_schema = pa.schema([
        (id_col, pa.int64()), (group_col, pa.string()),
        ("start_chunk", pa.int64()), ("start_offset", pa.int64()),
        ("end_chunk", pa.int64())])

    def kernel(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        order, starts, ids, ln, gvals = _group_sorted(
            tbl, group_col, id_col, len_col)
        cum = np.cumsum(ln)
        prev = cum - ln
        # restart the stream at each group head
        base = np.repeat(prev[starts], np.diff(
            np.concatenate((starts, [len(ids)]))))
        prev = prev - base
        return pa.table({
            id_col: ids,
            group_col: gvals.cast(pa.string()),
            "start_chunk": prev // chunk,
            "start_offset": prev % chunk,
            "end_chunk": (prev + ln - 1) // chunk,
        })

    return hash_exchange(
        ds.select_columns([id_col, group_col, len_col]),
        nbuckets=nbuckets, on=group_col, reduce_fn=kernel,
        schema=out_schema)


def pack_greedy(ds, *, id_col: str = "doc_id",
                len_col: str = "n_chars", group_col: str = "source",
                budget: int = 4096, nbuckets: int = 32):
    """Next-fit whole-document packing.  Returns (id, group, bin_id,
    bin_fill) where ``bin_id`` is 0-based per group and ``bin_fill``
    is the bin's total length (repeated on each member row).  A doc
    longer than ``budget`` gets a bin of its own (fill > budget)."""
    out_schema = pa.schema([
        (id_col, pa.int64()), (group_col, pa.string()),
        ("bin_id", pa.int64()), ("bin_fill", pa.int64())])

    def kernel(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        order, starts, ids, ln, gvals = _group_sorted(
            tbl, group_col, id_col, len_col)
        n = len(ids)
        ends = np.concatenate((starts[1:], [n]))
        cum = np.concatenate(([0], np.cumsum(ln)))  # cum[i] = sum < i
        bin_id = np.empty(n, np.int64)
        bin_fill = np.empty(n, np.int64)
        for s, e in zip(starts, ends):
            # boundary walk: bins' first-doc indices within [s, e)
            i, b = int(s), 0
            while i < e:
                # last j with cum[j] - cum[i] <= budget, at least i+1
                j = int(np.searchsorted(cum, cum[i] + budget, "right")) - 1
                j = min(max(j, i + 1), int(e))
                bin_id[i:j] = b
                bin_fill[i:j] = cum[j] - cum[i]
                b += 1
                i = j
        return pa.table({
            id_col: ids,
            group_col: gvals.cast(pa.string()),
            "bin_id": bin_id,
            "bin_fill": bin_fill,
        })

    return hash_exchange(
        ds.select_columns([id_col, group_col, len_col]),
        nbuckets=nbuckets, on=group_col, reduce_fn=kernel,
        schema=out_schema)


def chunk_spans(ds, *, id_col: str = "doc_id", len_col: str = "n_chars",
                chunk: int = 512, overlap: int = 64):
    """RAG-style sliding-window chunking: each document of length n
    yields chunks starting every ``stride = chunk - overlap`` units —
    chunk j covers ``[j*stride, min(j*stride + chunk, n))`` and the
    count is 1 for n <= chunk else ``ceil((n - chunk)/stride) + 1``
    (the last chunk always reaches the document end; consecutive
    chunks share ``overlap`` units).

    Pure per-row fan-out arithmetic — no shuffle, no exchange, just a
    ragged repeat inside map_batches: the embarrassingly-parallel
    regime.  Emits (id, chunk_idx, c_start, c_end).  Lengths must be
    >= 1; ``overlap < chunk`` required.
    """
    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap

    def fan(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "chunk_idx": pa.array([], pa.int64()),
                          "c_start": pa.array([], pa.int64()),
                          "c_end": pa.array([], pa.int64())})
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (n < 1).any():
            raise ValueError("document length < 1")
        k = np.where(n <= chunk, 1,
                     (n - chunk + stride - 1) // stride + 1)
        tot = int(k.sum())
        ri = np.repeat(np.arange(len(ids), dtype=np.int64), k)
        j = (np.arange(tot, dtype=np.int64)
             - np.repeat(np.cumsum(k) - k, k))
        start = j * stride
        end = np.minimum(start + chunk, n[ri])
        return pa.table({id_col: pa.array(ids[ri]),
                         "chunk_idx": pa.array(j),
                         "c_start": pa.array(start),
                         "c_end": pa.array(end)})

    return ds.map_batches(fan, batch_format="pyarrow",
                          zero_copy_batch=True)
