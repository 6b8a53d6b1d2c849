"""Deterministic synthetic CDC log generator (vectorized, seeded).

Shapes the log exactly like a ScyllaDB CDC log table (metadata column
convention: /root/reference/scylla-cdc/src/consumer.rs:71-78; operation
codes incl. negative TTL-expiration alternatives: consumer.rs:37-52),
with the timeuuid replaced by its (ms, seq) surrogate per FIXTURES.md §2.

Everything is numpy/pyarrow vectorized — generating 10^7 events takes
seconds; the same spec parameterizes up for bench scale.

Per-stream ordering invariant: (cdc_time_ms, cdc_time_seq,
cdc$batch_seq_no) strictly increasing — the reference reads the log in
this clustering order (stream_reader.rs:200-213).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from scylla_cdc_rust_spark.model import (
    BATCH_SEQ,
    DELETED_ELEMS_PREFIX,
    DELETED_PREFIX,
    END_OF_BATCH,
    EPOCH,
    OPERATION,
    STREAM_ID,
    TIME_MS,
    TIME_SEQ,
    TTL,
    OperationType,
)

T0_MS = 1_700_000_000_000  # fixed base instant (determinism, no wall clock)

# op mix (weights): insert, update-overwrite, update-scalar, col-delete,
# delta-add, delta-remove, row-delete, partition-delete, ttl-expire-delete
OP_KINDS = np.array(
    ["ins", "ovw", "upd", "cdel", "dadd", "drem", "rdel", "pdel", "xdel"]
)
OP_WEIGHTS = np.array([0.38, 0.14, 0.16, 0.05, 0.10, 0.07, 0.05, 0.02, 0.03])

SOURCES = np.array(["web", "book", "code", "wiki"])


@dataclass
class LogSpec:
    n_events: int = 10_000
    n_docs: int = 1_000
    n_streams: int = 32  # vnode-ish stream count per generation
    n_epochs: int = 1  # generations
    hot_doc_frac: float = 0.0  # fraction of events hitting doc 0 (skew)
    seed: int = 42
    max_tokens: int = 12
    vocab: int = 30_000
    ttl_frac: float = 0.1


def _list_array(mask: np.ndarray, lengths: np.ndarray, values: np.ndarray) -> pa.Array:
    """Build a nullable list<int32> array: rows where mask is False are null."""
    eff_len = np.where(mask, lengths, 0)
    offsets = np.zeros(len(mask) + 1, dtype=np.int32)
    np.cumsum(eff_len, out=offsets[1:])
    arr = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(values.astype(np.int32), type=pa.int32())
    )
    # apply null mask
    return pa.ListArray.from_arrays(
        pa.array(offsets), arr.values, mask=pa.array(~mask)
    )


def generate_log(spec: LogSpec) -> pa.Table:
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # --- batches: events grouped into write batches sharing (ms, seq) ---
    batch_len_choices = np.array([1, 1, 1, 1, 2, 3])
    est = n // 1 + 8
    blens = rng.choice(batch_len_choices, size=est)
    cum = np.cumsum(blens)
    n_batches = int(np.searchsorted(cum, n) + 1)
    blens = blens[:n_batches]
    deficit = int(cum[n_batches - 1] - n)
    blens[-1] -= deficit
    if blens[-1] <= 0:  # degenerate tail
        blens = blens[blens > 0]
        n_batches = len(blens)
    batch_id = np.repeat(np.arange(n_batches), blens)  # per event
    n = len(batch_id)

    # 4 batches share one ms tick, distinguished by seq (stresses the
    # (ms, seq) tie-break of the timeuuid surrogate)
    ms_idx = batch_id // 4
    time_ms = T0_MS + ms_idx * 1_000
    time_seq = (batch_id % 4).astype(np.int64)

    # --- epochs: contiguous time slices (generation = one epoch) ---
    max_ms_idx = int(ms_idx[-1]) + 1
    epoch = (ms_idx * spec.n_epochs // max_ms_idx).astype(np.int32)

    # --- docs (optionally skewed) and streams ---
    doc_idx = rng.integers(0, spec.n_docs, size=n)
    if spec.hot_doc_frac > 0:
        hot = rng.random(n) < spec.hot_doc_frac
        doc_idx[hot] = 0
    bucket = (doc_idx % spec.n_streams).astype(np.int64)
    # 16-byte stream id: 4B epoch | 4B bucket | 8B zero (blob, cdc_types.rs:211-214)
    sid = np.zeros((n, 16), dtype=np.uint8)
    sid[:, 0:4] = epoch.astype(">u4").view(np.uint8).reshape(n, 4)
    sid[:, 4:8] = bucket.astype(">u4").view(np.uint8).reshape(n, 4)
    stream_id = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(16), n, [None, pa.py_buffer(sid.tobytes())]
    ).cast(pa.binary())

    # batch_seq_no / end_of_batch PER STREAM (consumer.rs:163-164): a
    # multi-partition write batch appears in each touched stream's log
    # as its own contiguous 0..k batch with end_of_batch on the last row
    # — rows of one generator batch go to the stream of their doc, so
    # renumber within (batch, stream) groups, preserving event order
    gkey = batch_id.astype(np.int64) * spec.n_streams + bucket
    order = np.argsort(gkey, kind="stable")
    sorted_k = gkey[order]
    starts = np.r_[0, np.flatnonzero(np.diff(sorted_k)) + 1]
    glens = np.diff(np.r_[starts, n])
    ranks_sorted = np.arange(n) - np.repeat(starts, glens)
    batch_seq = np.empty(n, dtype=np.int32)
    batch_seq[order] = ranks_sorted.astype(np.int32)
    end_of_batch = np.zeros(n, dtype=bool)
    end_of_batch[order[np.r_[starts[1:] - 1, n - 1]]] = True

    # --- op kinds → raw cdc$operation codes ---
    kind_idx = rng.choice(len(OP_KINDS), size=n, p=OP_WEIGHTS)
    kind = OP_KINDS[kind_idx]
    raw_op = np.zeros(n, dtype=np.int8)
    raw_op[kind == "ins"] = OperationType.ROW_INSERT
    for k in ("ovw", "upd", "cdel", "dadd", "drem"):
        raw_op[kind == k] = OperationType.ROW_UPDATE
    raw_op[kind == "rdel"] = OperationType.ROW_DELETE
    raw_op[kind == "pdel"] = OperationType.PARTITION_DELETE
    raw_op[kind == "xdel"] = -OperationType.ROW_DELETE  # TTL expiration (consumer.rs:43-46)

    is_write = (kind == "ins") | (kind == "ovw") | (kind == "upd")

    # --- payload ---
    tok_len = rng.integers(2, spec.max_tokens + 1, size=n)
    has_tokens = (kind == "ins") | (kind == "ovw") | (kind == "dadd")
    # delta adds are small
    tok_len[kind == "dadd"] = rng.integers(1, 4, size=int((kind == "dadd").sum()))
    total_tok = int(np.where(has_tokens, tok_len, 0).sum())
    tok_values = rng.integers(0, spec.vocab, size=total_tok)
    # set semantics per row: sort+unique within each list (Scylla set<int>)
    eff = np.where(has_tokens, tok_len, 0)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(eff, out=offs[1:])
    sorted_vals = np.empty_like(tok_values)
    seg_ids = np.repeat(np.arange(n), eff)
    order = np.lexsort((tok_values, seg_ids))
    sorted_vals = tok_values[order]
    # dedup within segment: replace dup with value+1 mod vocab is messy; keep
    # dups possible — oracle & engine both apply set()-dedup so it's consistent
    tokens_arr = _list_array(has_tokens, tok_len, sorted_vals)

    # deleted_elements for delta-removes: small arrays over the same vocab
    drem_mask = kind == "drem"
    del_len = rng.integers(1, 4, size=n)
    total_del = int(np.where(drem_mask, del_len, 0).sum())
    del_vals = rng.integers(0, spec.vocab, size=total_del)
    eff_d = np.where(drem_mask, del_len, 0)
    seg_d = np.repeat(np.arange(n), eff_d)
    del_vals = del_vals[np.lexsort((del_vals, seg_d))]
    del_elems_arr = _list_array(drem_mask, del_len, del_vals)

    # n_tok / source: written on insert & overwrite; 'upd' writes a random
    # subset of scalars; 'cdel' deletes one scalar column
    upd_scalar_pick = rng.integers(0, 3, size=n)  # 0: n_tok, 1: source, 2: both
    has_n_tok = (kind == "ins") | (kind == "ovw") | ((kind == "upd") & (upd_scalar_pick != 1))
    has_source = (kind == "ins") | ((kind == "upd") & (upd_scalar_pick != 0))
    n_tok_vals = tok_len.astype(np.int32)
    n_tok_vals[~has_tokens] = rng.integers(0, 64, size=int((~has_tokens).sum()))
    source_vals = SOURCES[rng.integers(0, len(SOURCES), size=n)]

    cdel_pick = rng.integers(0, 3, size=n)  # which column a cdel tombstones
    del_tokens = ((kind == "ins") | (kind == "ovw") | ((kind == "cdel") & (cdel_pick == 0)))
    # insert/overwrite of a non-frozen collection ⇒ whole-collection
    # tombstone + new elements in the same change (Scylla CDC encoding;
    # replicator dispatch at replicator_consumer.rs:439-469)
    del_n_tok = (kind == "cdel") & (cdel_pick == 1)
    del_source = (kind == "cdel") & (cdel_pick == 2)

    ttl_mask = is_write & (rng.random(n) < spec.ttl_frac)
    ttl_vals = rng.integers(3600, 86_400, size=n).astype(np.int64)

    doc_ids = np.char.add("doc_", np.char.zfill(doc_idx.astype(str), 8))

    def masked(vals, mask, typ):
        return pa.array(vals, type=typ, mask=~mask)

    tbl = pa.table(
        {
            STREAM_ID: stream_id,
            TIME_MS: pa.array(time_ms, type=pa.int64()),
            TIME_SEQ: pa.array(time_seq, type=pa.int64()),
            BATCH_SEQ: pa.array(batch_seq, type=pa.int32()),
            END_OF_BATCH: pa.array(end_of_batch),
            OPERATION: pa.array(raw_op, type=pa.int8()),
            TTL: masked(ttl_vals, ttl_mask, pa.int64()),
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens_arr,
            "n_tok": masked(n_tok_vals, has_n_tok, pa.int32()),
            "source": masked(source_vals, has_source, pa.string()),
            DELETED_PREFIX + "tokens": pa.array(del_tokens),
            DELETED_ELEMS_PREFIX + "tokens": del_elems_arr,
            DELETED_PREFIX + "n_tok": pa.array(del_n_tok),
            DELETED_PREFIX + "source": pa.array(del_source),
            EPOCH: pa.array(epoch, type=pa.int32()),
        }
    )
    return tbl


def write_log(
    tbl: pa.Table,
    path: str,
    shuffle_seed: int = 7,
    files_per_epoch: int = 4,
    ordered_files: bool = True,
) -> str:
    """Write the log as an epoch-partitioned parquet dir.

    ``ordered_files=True`` (realistic CDC segment layout): files cover
    contiguous time ranges, rows WITHIN each file are shuffled — the
    engine must not rely on row order, only on the (ms, seq, batch_seq)
    columns (the reference's clustering-ordered scan contract), and the
    streaming path's safety interval only needs to cover intra-segment
    skew.  ``ordered_files=False`` shuffles the whole epoch across files
    (adversarial; batch replay handles it, bounded-lateness streaming
    by design does not — stream_reader.rs:304-331's clock-drift guard
    makes the same assumption).
    """
    rng = np.random.default_rng(shuffle_seed)
    epochs = tbl.column(EPOCH).to_numpy()
    times = tbl.column(TIME_MS).to_numpy()
    os.makedirs(path, exist_ok=True)
    for ep in np.unique(epochs):
        idx = np.flatnonzero(epochs == ep)
        if ordered_files:
            idx = idx[np.argsort(times[idx], kind="stable")]
        else:
            rng.shuffle(idx)
        chunks = np.array_split(np.arange(len(idx)), max(1, files_per_epoch))
        if ordered_files:
            for ch in chunks:
                perm = rng.permutation(len(ch))
                idx[ch[0] : ch[0] + len(ch)] = idx[ch[0] + perm]
        sub = tbl.take(pa.array(idx))
        ep_dir = os.path.join(path, f"{EPOCH}={ep}")
        os.makedirs(ep_dir, exist_ok=True)
        sub = sub.drop_columns([EPOCH])
        for i, ch in enumerate(chunks):
            if len(ch):
                pq.write_table(
                    sub.slice(int(ch[0]), len(ch)),
                    os.path.join(ep_dir, f"part-{i:04d}.parquet"),
                )
    return path
