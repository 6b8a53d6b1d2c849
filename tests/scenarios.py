"""Hand-built CDC op-sequence builder for scenario tests.

Mirrors the reference's replication test harness
(replication_tests.rs:461-986): each scenario is an explicit op list,
replayed by both the engine and the oracle.
"""

from __future__ import annotations

import pyarrow as pa

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

T0 = 1_700_000_000_000

ARROW_SCHEMA = pa.schema(
    [
        (STREAM_ID, pa.binary()),
        (TIME_MS, pa.int64()),
        (TIME_SEQ, pa.int64()),
        (BATCH_SEQ, pa.int32()),
        (END_OF_BATCH, pa.bool_()),
        (OPERATION, pa.int8()),
        (TTL, pa.int64()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        (DELETED_PREFIX + "tokens", pa.bool_()),
        (DELETED_ELEMS_PREFIX + "tokens", pa.list_(pa.int32())),
        (DELETED_PREFIX + "n_tok", pa.bool_()),
        (DELETED_PREFIX + "source", pa.bool_()),
        (EPOCH, pa.int32()),
    ]
)


class LogBuilder:
    def __init__(self):
        self.rows: list[dict] = []
        self._t = 0

    def _emit(self, doc, op, *, batch=None, **kw):
        if batch is None:
            self._t += 1
            t, seq, bs, eob = T0 + self._t * 1000, 0, 0, True
        else:
            t, seq, bs, eob = batch
        row = {
            STREAM_ID: b"\x00" * 12 + (hash(doc) % 256).to_bytes(4, "big"),
            TIME_MS: t,
            TIME_SEQ: seq,
            BATCH_SEQ: bs,
            END_OF_BATCH: eob,
            OPERATION: int(op),
            TTL: kw.get("ttl"),
            "doc_id": doc,
            "tokens": kw.get("tokens"),
            "n_tok": kw.get("n_tok"),
            "source": kw.get("source"),
            DELETED_PREFIX + "tokens": kw.get("del_tokens", False),
            DELETED_ELEMS_PREFIX + "tokens": kw.get("del_elems"),
            DELETED_PREFIX + "n_tok": kw.get("del_n_tok", False),
            DELETED_PREFIX + "source": kw.get("del_source", False),
            EPOCH: kw.get("epoch", 0),
        }
        self.rows.append(row)
        return self

    def insert(self, doc, tokens, source="web", ttl=None, **kw):
        # inserting a non-frozen collection ⇒ tombstone+value (Scylla CDC)
        return self._emit(
            doc,
            OperationType.ROW_INSERT,
            tokens=tokens,
            n_tok=len(tokens) if tokens is not None else None,
            source=source,
            del_tokens=tokens is not None,
            ttl=ttl,
            **kw,
        )

    def update(self, doc, **kw):
        return self._emit(doc, OperationType.ROW_UPDATE, **kw)

    def overwrite_tokens(self, doc, tokens, **kw):
        kw.setdefault("del_tokens", True)
        kw.setdefault("n_tok", len(tokens) if tokens is not None else None)
        return self.update(doc, tokens=tokens, **kw)

    def add_tokens(self, doc, tokens, **kw):
        return self.update(doc, tokens=tokens, **kw)

    def remove_tokens(self, doc, elems, **kw):
        return self.update(doc, del_elems=elems, **kw)

    def delete_col(self, doc, col, **kw):
        return self.update(doc, **{f"del_{col}": True}, **kw)

    def delete_row(self, doc, expired=False, **kw):
        op = -int(OperationType.ROW_DELETE) if expired else OperationType.ROW_DELETE
        return self._emit(doc, op, **kw)

    def delete_partition(self, doc, expired=False, **kw):
        op = (
            -int(OperationType.PARTITION_DELETE)
            if expired
            else OperationType.PARTITION_DELETE
        )
        return self._emit(doc, op, **kw)

    def image(self, doc, pre=True, **kw):
        op = OperationType.PRE_IMAGE if pre else OperationType.POST_IMAGE
        return self._emit(doc, op, **kw)

    def batch(self, doc_ops: list[tuple]):
        """doc_ops: list of (doc, op_kind, kwargs); shared (ms, seq)."""
        self._t += 1
        t = T0 + self._t * 1000
        for i, (doc, kind, kw) in enumerate(doc_ops):
            eob = i == len(doc_ops) - 1
            method = getattr(self, kind)
            # temporarily route through _emit with explicit batch tuple
            before = len(self.rows)
            method(doc, **kw)
            self.rows[before][TIME_MS] = t
            self.rows[before][TIME_SEQ] = 0
            self.rows[before][BATCH_SEQ] = i
            self.rows[before][END_OF_BATCH] = eob
        return self

    def build(self) -> pa.Table:
        cols = {f.name: [r[f.name] for r in self.rows] for f in ARROW_SCHEMA}
        return pa.table(cols, schema=ARROW_SCHEMA)
