"""Single-threaded oracle replay — the correctness ground truth.

Replays the CDC log strictly in (cdc_time_ms, cdc_time_seq,
cdc$batch_seq_no) order per the reference's delivery guarantee
(/root/reference/scylla-cdc/src/stream_reader.rs:392-396: serial
consume in clustering order) and applies the replicator's semantics
(A1–A11, SURVEY.md §2.4; dispatch at
/root/reference/scylla-cdc-replicator/src/replicator_consumer.rs:866-883):

- ROW_INSERT: row marker + per-column overwrite (update_or_insert(.., true),
  replicator_consumer.rs:408-410)
- ROW_UPDATE: per-column overwrite only; unmentioned columns untouched
  (replicator_consumer.rs:404-406)
- column overwrite: value present → set; cdc$deleted_<col> → null
  (overwrite_column, replicator_consumer.rs:727-748)
- ROW_DELETE / PARTITION_DELETE: drop the row (single-column key ⇒
  identical; delete_row replicator_consumer.rs:719-724,
  delete_partition :392-402); negative codes = TTL expiration
  (consumer.rs:43-46) — same effect, flag only
- non-frozen set delta: deleted flag → overwrite; else add value
  elements, remove cdc$deleted_elements_<col> elements
  (update_map_or_set, replicator_consumer.rs:439-469); empty set ⇒ null
- 'list' mode: whole-array overwrite only (A8 fast path)
- TTL/write-ts bookkeeping: last applied write's ttl and ord are kept
  (USING TIMESTAMP/TTL propagation, replicator_consumer.rs:311-333,703-716)

Row-existence rule (Cassandra/Scylla semantics): a row exists iff its
row marker is live (set by INSERT) or it has ≥1 live (non-null) cell.

The end-state comparison mirrors replication_tests.rs:166-208
(compare_changes: destination table must equal source row-by-row).
"""

from __future__ import annotations

import pyarrow as pa

from scylla_cdc_rust_spark.model import (
    BATCH_SEQ,
    DELETED_ELEMS_PREFIX,
    DELETED_PREFIX,
    OPERATION,
    TIME_MS,
    TIME_SEQ,
    TTL,
    CDCSchema,
    OperationType,
    pack_ord_py,
)

_DELETES = {int(OperationType.ROW_DELETE), int(OperationType.PARTITION_DELETE)}
_WRITES = {int(OperationType.ROW_UPDATE), int(OperationType.ROW_INSERT)}


class _Row:
    __slots__ = ("marker", "cells", "ttl", "last_ord")

    def __init__(self):
        self.marker = False
        self.cells = {}
        self.ttl = None
        self.last_ord = -1

    def exists(self):
        return self.marker or any(v is not None for v in self.cells.values())


def oracle_replay(
    tbl: pa.Table,
    key: str | list[str] = "doc_id",
    collection_modes: dict[str, str] | None = None,
    partition_key: str | list[str] | None = None,
) -> dict:
    """Replay a CDC log table; return {key: {col: value, 'ttl':.., 'last_ord':..}}.

    ``key`` may be a list (composite pk/ck keys → tuple dict keys);
    ``partition_key`` (pk subset) makes PARTITION_DELETE drop every row
    whose pk prefix matches (A5 general form,
    replicator_consumer.rs:392-402) instead of only its own key group.
    """
    collection_modes = collection_modes or {"tokens": "set"}
    schema = CDCSchema.from_columns(tbl.column_names)
    keys = [key] if isinstance(key, str) else list(key)
    pks = (
        None
        if partition_key is None
        else ([partition_key] if isinstance(partition_key, str) else list(partition_key))
    )
    payload_cols = [c for c in schema.payload if c not in keys]

    def keyof(r):
        return r[keys[0]] if len(keys) == 1 else tuple(r[k] for k in keys)

    rows = tbl.to_pylist()
    rows.sort(key=lambda r: (r[TIME_MS], r[TIME_SEQ], r[BATCH_SEQ]))

    state: dict = {}
    pk_idx = [keys.index(p) for p in pks] if pks else []
    for r in rows:
        raw = r[OPERATION]
        op = -raw if raw < 0 else raw  # TTL-expiration normalization
        ordv = pack_ord_py(r[TIME_MS], r[TIME_SEQ], r[BATCH_SEQ])
        k = keyof(r)
        if pks is not None and op == int(OperationType.PARTITION_DELETE):
            pkv = tuple(r[p] for p in pks)
            dead = [
                sk
                for sk in state
                if tuple(sk[i] for i in pk_idx) == pkv
            ]
            for sk in dead:
                state.pop(sk, None)
            continue
        if op in _DELETES:
            state.pop(k, None)
            continue
        if op not in _WRITES:
            continue  # pre/post-image ignored (replicator_consumer.rs:878)
        row = state.setdefault(k, _Row())
        if op == OperationType.ROW_INSERT:
            row.marker = True
        for c in payload_cols:
            val = r.get(c)
            deleted = bool(r.get(DELETED_PREFIX + c) or False)
            del_elems = r.get(DELETED_ELEMS_PREFIX + c)
            mode = collection_modes.get(c, "atomic")
            if mode == "set":
                if deleted:
                    # overwrite resets to this change's elements; a
                    # same-change deleted_elements entry still wins the
                    # equal-timestamp tie (removal beats addition)
                    cur = set(val) if val else set()
                    if del_elems:
                        cur -= set(del_elems)
                    row.cells[c] = sorted(cur) if cur else None
                else:
                    cur = set(row.cells.get(c) or [])
                    if val:
                        cur |= set(val)
                    if del_elems:
                        cur -= set(del_elems)
                    if val or del_elems:
                        row.cells[c] = sorted(cur) if cur else None
            elif mode in ("map", "list_delta"):
                # per-(map)key value LWW (update_map_or_set,
                # replicator_consumer.rs:415-469; update_list :472-528);
                # arrow map columns arrive as list-of-(k, v) pairs
                val_d = dict(val) if val else None
                if deleted:
                    cur = dict(val_d) if val_d else {}
                    for k2 in del_elems or []:
                        cur.pop(k2, None)
                    row.cells[c] = cur or None
                elif val_d or del_elems:
                    cur = dict(row.cells.get(c) or {})
                    if val_d:
                        cur.update(val_d)
                    for k2 in del_elems or []:
                        cur.pop(k2, None)
                    row.cells[c] = cur or None
            elif mode == "udt":
                # per-field LWW (update_udt, replicator_consumer.rs:568-585):
                # overwrite replaces the whole struct; otherwise a present
                # value updates non-null fields and nulls the smallint
                # deleted-field indices (:540-544); a present field value
                # wins over its delete index within one change (:546)
                if deleted:
                    cur = dict(val) if val is not None else None
                elif val is not None:
                    fieldnames = list(val)
                    cur = dict(row.cells.get(c) or {fn: None for fn in fieldnames})
                    delset = set(del_elems or [])
                    for i, fn in enumerate(fieldnames):
                        if val[fn] is not None:
                            cur[fn] = val[fn]
                        elif i in delset:
                            cur[fn] = None
                else:
                    continue
                if cur is not None and not any(v is not None for v in cur.values()):
                    cur = None
                row.cells[c] = cur
            else:  # atomic / list: whole-cell overwrite
                if val is not None:
                    row.cells[c] = val
                elif deleted:
                    row.cells[c] = None
        row.ttl = r.get(TTL)
        row.last_ord = ordv

    out = {}
    for k, row in state.items():
        if not row.exists():
            continue
        rec = {c: row.cells.get(c) for c in payload_cols}
        rec["ttl"] = row.ttl
        rec["last_ord"] = row.last_ord
        out[k] = rec
    return out
