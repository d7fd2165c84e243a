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


_CDC_BASE = np.uint64(1099511628211)


def cdc_chunk_stats(col, *, window: int = 16, mask_bits: int = 6,
                    min_size: int = 32, max_size: int = 512):
    """Content-defined chunking (the dedup-storage / FastCDC family):
    a chunk boundary falls where the rolling polynomial hash of the
    last ``window`` bytes has ``mask_bits`` low zero bits — content,
    not position, decides the cut, so an insertion only perturbs
    nearby chunks.  The PINNED deterministic variant (documented, and
    replayed by the scalar test): natural boundaries thinner than
    ``min_size`` apart are debounced (cooldown restarts from the last
    kept cut — the debounce chain), then gaps wider than ``max_size``
    get forced cuts at multiples of ``max_size`` from the previous
    kept cut WITHOUT re-evaluating naturals.

    Fully vectorized over the flat byte buffer: the rolling hash is
    ``window`` shifted wrapping multiply-adds over ALL documents at
    once (windows straddling a document start are masked), the
    debounce chain runs in lockstep searchsorted rounds across
    documents.  Returns (n_chunks, sum_sq_len, max_len) int64 arrays
    per row."""
    from ..functions.text import _string_parts

    data, offs = _string_parts(col)
    nd = len(offs) - 1
    lens = np.diff(offs)
    total = int(offs[-1] - offs[0])
    data = data[offs[0]:offs[-1]]
    offs = offs - offs[0]
    if total == 0:
        z = np.zeros(nd, np.int64)
        return (lens > 0).astype(np.int64), z, z

    with np.errstate(over="ignore"):
        powers = np.concatenate((
            [np.uint64(1)],
            np.cumprod(np.full(window - 1, _CDC_BASE, np.uint64)))) \
            .astype(np.uint64)
        h = np.zeros(total, np.uint64)
        b = data.astype(np.uint64)
        for j in range(min(window, total)):  # shifted adds, vectorized
            h[j:] += b[:total - j] * powers[j]
    doc_of = np.repeat(np.arange(nd), lens)
    pos_in = np.arange(total) - offs[doc_of]
    mask = np.uint64((1 << mask_bits) - 1)
    natural = ((h & mask) == 0) & (pos_in >= window - 1) \
        & (pos_in < lens[doc_of] - 1)  # a cut at the last byte is moot

    # debounce naturals per doc: lockstep rounds (cooldown = min_size)
    cand = np.flatnonzero(natural)
    cdoc = doc_of[cand]
    cpos = pos_in[cand]
    starts = np.searchsorted(cdoc, np.arange(nd))
    ends = np.searchsorted(cdoc, np.arange(nd), side="right")
    span = int(lens.max()) + min_size + 1
    cglob = cpos + cdoc * span
    cur = starts[starts < ends]
    kept = []
    while len(cur):
        kept.append(cur)
        nxt = np.searchsorted(cglob, cglob[cur] + min_size)
        ok = nxt < ends[cdoc[cur]]
        cur = nxt[ok]
    kpos = np.sort(np.concatenate(kept)) if kept \
        else np.empty(0, np.int64)
    kdoc, kcut = cdoc[kpos], cpos[kpos]

    # chunk lengths: cuts split [0, len) after position kcut
    n_chunks = np.zeros(nd, np.int64)
    sum_sq = np.zeros(nd, np.int64)
    max_len = np.zeros(nd, np.int64)
    # segment walk per doc vectorized via prepend/append of cut lists
    cut_counts = np.bincount(kdoc, minlength=nd)
    ends_of = np.cumsum(cut_counts)
    starts_of = ends_of - cut_counts
    # previous cut position per kept cut (or -1 at doc head)
    prev = np.empty(len(kcut), np.int64)
    prev[1:] = kcut[:-1]
    prev[starts_of[cut_counts > 0]] = -1
    seg_lens = [kcut - prev]  # natural chunks (cut inclusive)
    seg_docs = [kdoc]
    # tail chunk per doc: from last cut (or -1) to len-1
    last_cut = np.full(nd, -1, np.int64)
    if len(kcut):
        nz = np.flatnonzero(cut_counts)
        last_cut[nz] = kcut[ends_of[nz] - 1]
    tail = lens - 1 - last_cut
    nz_tail = tail > 0
    seg_lens.append(tail[nz_tail])
    seg_docs.append(np.flatnonzero(nz_tail))
    sl = np.concatenate(seg_lens)
    sd = np.concatenate(seg_docs)
    # forced cuts inside over-long segments: a segment of length L
    # becomes ceil(L / max_size) chunks of max_size (+ remainder)
    nfull = sl // max_size
    rem = sl - nfull * max_size
    cnt = nfull + (rem > 0)
    n_chunks = np.bincount(sd, weights=cnt.astype(np.float64),
                           minlength=nd).astype(np.int64)
    sq = nfull * max_size * max_size + rem * rem
    if int(sl.max(initial=0)) ** 2 >= 1 << 53:
        raise OverflowError("cdc_chunk_stats: chunk length bound")
    sum_sq = np.bincount(sd, weights=sq.astype(np.float64),
                         minlength=nd).astype(np.int64)
    mx = np.minimum(sl, np.where(nfull > 0, max_size, sl))
    max_len = np.zeros(nd, np.int64)
    np.maximum.at(max_len, sd, mx)
    return n_chunks, sum_sq, max_len
