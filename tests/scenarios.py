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


# ---------------------------------------------------------------------------
# General table: non-frozen list (timeuuid-keyed map encoding), map, UDT
# (replication_tests.rs list/udt scenarios; replicator_consumer.rs:415-585)
# ---------------------------------------------------------------------------

GENERAL_ARROW_SCHEMA = pa.schema(
    [
        (STREAM_ID, pa.binary()),
        (TIME_MS, pa.int64()),
        (TIME_SEQ, pa.int64()),
        (BATCH_SEQ, pa.int32()),
        (END_OF_BATCH, pa.bool_()),
        (OPERATION, pa.int8()),
        (TTL, pa.int64()),
        ("doc_id", pa.string()),
        # non-frozen list<int>: CDC encodes as map<timeuuid → elem>
        ("vals", pa.map_(pa.string(), pa.int32())),
        (DELETED_PREFIX + "vals", pa.bool_()),
        (DELETED_ELEMS_PREFIX + "vals", pa.list_(pa.string())),
        # non-frozen map<text, int>
        ("attrs", pa.map_(pa.string(), pa.int32())),
        (DELETED_PREFIX + "attrs", pa.bool_()),
        (DELETED_ELEMS_PREFIX + "attrs", pa.list_(pa.string())),
        # non-frozen UDT ut(int_val int, bool_val boolean)
        ("meta", pa.struct([("int_val", pa.int32()), ("bool_val", pa.bool_())])),
        (DELETED_PREFIX + "meta", pa.bool_()),
        (DELETED_ELEMS_PREFIX + "meta", pa.list_(pa.int16())),
        (EPOCH, pa.int32()),
    ]
)

GENERAL_MODES = {"vals": "list_delta", "attrs": "map", "meta": "udt"}


class GeneralLogBuilder:
    """Op builder over the general table.  List ops take explicit
    timeuuid-surrogate keys (zero-padded strings sort chronologically,
    like real timeuuids in Scylla's internal list representation); the
    ``list_*`` convenience methods auto-assign monotonically increasing
    keys the way Scylla assigns timeuuids on append."""

    def __init__(self):
        self.rows: list[dict] = []
        self._t = 0
        self._keyseq = 0

    def _next_key(self) -> str:
        self._keyseq += 1
        return f"k{self._keyseq:08d}"

    def _emit(self, doc, op, **kw):
        self._t += 1
        if isinstance(kw.get("attrs"), dict):
            kw["attrs"] = list(kw["attrs"].items())
        if isinstance(kw.get("vals"), dict):
            kw["vals"] = list(kw["vals"].items())
        row = {
            STREAM_ID: b"\x01" * 12 + (hash(doc) % 256).to_bytes(4, "big"),
            TIME_MS: T0 + self._t * 1000,
            TIME_SEQ: 0,
            BATCH_SEQ: 0,
            END_OF_BATCH: True,
            OPERATION: int(op),
            TTL: kw.get("ttl"),
            "doc_id": doc,
            "vals": kw.get("vals"),
            DELETED_PREFIX + "vals": kw.get("del_vals", False),
            DELETED_ELEMS_PREFIX + "vals": kw.get("del_val_keys"),
            "attrs": kw.get("attrs"),
            DELETED_PREFIX + "attrs": kw.get("del_attrs", False),
            DELETED_ELEMS_PREFIX + "attrs": kw.get("del_attr_keys"),
            "meta": kw.get("meta"),
            DELETED_PREFIX + "meta": kw.get("del_meta", False),
            DELETED_ELEMS_PREFIX + "meta": kw.get("del_meta_ids"),
            EPOCH: kw.get("epoch", 0),
        }
        self.rows.append(row)
        return self

    # --- row ops ---
    def insert(self, doc, **kw):
        # INSERT overwrites every mentioned non-frozen collection
        if "vals" in kw and isinstance(kw["vals"], list):
            kw["vals"] = [(self._next_key(), v) for v in kw["vals"]]
        for col, flag in (("vals", "del_vals"), ("attrs", "del_attrs"),
                          ("meta", "del_meta")):
            if kw.get(col) is not None:
                kw.setdefault(flag, True)
        return self._emit(doc, OperationType.ROW_INSERT, **kw)

    def update(self, doc, **kw):
        if "vals" in kw and isinstance(kw["vals"], list):
            kw["vals"] = [(self._next_key(), v) for v in kw["vals"]]
        return self._emit(doc, OperationType.ROW_UPDATE, **kw)

    def delete_row(self, doc, **kw):
        return self._emit(doc, OperationType.ROW_DELETE, **kw)

    # --- list (vals) ---
    def list_append(self, doc, elems, **kw):
        """UPDATE SET v = v + [...] — new timeuuid keys."""
        return self.update(doc, vals=list(elems), **kw)

    def list_remove_keys(self, doc, keys, **kw):
        """UPDATE SET v = v - [...] — server resolves values to keys;
        the CDC log carries the key tombstones."""
        return self.update(doc, del_val_keys=list(keys), **kw)

    def list_replace(self, doc, elems, **kw):
        """UPDATE SET v = [...] — overwrite: tombstone + fresh keys."""
        return self.update(doc, vals=list(elems), del_vals=True, **kw)

    def current_keys_of(self, doc):
        """Keys currently alive for doc's vals, replayed sequentially —
        what the server would resolve a remove-by-value against."""
        state = {}
        for r in self.rows:
            if r["doc_id"] != doc:
                continue
            if r[OPERATION] in (int(OperationType.ROW_DELETE),
                                int(OperationType.PARTITION_DELETE)):
                state = {}
                continue
            if r[DELETED_PREFIX + "vals"]:
                state = {}
            if r["vals"]:
                state.update(dict(r["vals"]))
            for k in r[DELETED_ELEMS_PREFIX + "vals"] or []:
                state.pop(k, None)
        return state

    def list_remove_values(self, doc, values, **kw):
        """Remove all occurrences of the given values (v = v - [vals])."""
        cur = self.current_keys_of(doc)
        keys = [k for k, v in cur.items() if v in set(values)]
        return self.list_remove_keys(doc, keys, **kw)

    # --- map (attrs) ---
    def map_put(self, doc, entries: dict, **kw):
        return self.update(doc, attrs=list(entries.items()), **kw)

    def map_remove(self, doc, keys, **kw):
        return self.update(doc, del_attr_keys=list(keys), **kw)

    def map_overwrite(self, doc, entries: dict | None, **kw):
        return self.update(
            doc,
            attrs=list(entries.items()) if entries is not None else None,
            del_attrs=True,
            **kw,
        )

    # --- udt (meta) ---
    def udt_overwrite(self, doc, int_val=None, bool_val=None, null=False, **kw):
        meta = None if null else {"int_val": int_val, "bool_val": bool_val}
        return self.update(doc, meta=meta, del_meta=True, **kw)

    def udt_set_fields(self, doc, int_val=None, bool_val=None, del_fields=(), **kw):
        """UPDATE SET v.f = x[, v.g = null]: value struct carries the
        non-null fields; explicit nulls appear as smallint field indices
        in cdc$deleted_elements (replicator_consumer.rs:540-544)."""
        ids = {"int_val": 0, "bool_val": 1}
        return self.update(
            doc,
            meta={"int_val": int_val, "bool_val": bool_val},
            del_meta_ids=[ids[f] for f in del_fields] or None,
            **kw,
        )

    def build(self) -> pa.Table:
        cols = {f.name: [r[f.name] for r in self.rows] for f in GENERAL_ARROW_SCHEMA}
        return pa.table(cols, schema=GENERAL_ARROW_SCHEMA)
