"""Consumer API — the reference's user-facing trait surface on Spark.

Reference: ``trait Consumer { async fn consume_cdc(&mut self, CDCRow) }``
with one consumer instance per stream group consuming rows serially in
clustering order (consumer.rs:13-33; serial consume loop
stream_reader.rs:392-396), created per group by a ConsumerFactory.

Spark mapping: ``consume_streams`` hash-partitions the decoded log by
``cdc$stream_id``, sorts each partition by the per-stream total order,
and runs an Arrow-batched ``mapInPandas`` over it — each partition
holds whole streams in order, so a consumer sees exactly the
reference's delivery contract (per-stream serial, batches are just
Arrow chunking).  Consumers receive pandas DataFrames, not single rows:
the row-at-a-time trait is widened to a vectorized batch interface
(the engine's zero-per-row-Python rule); a consumer that truly needs
row granularity iterates inside its own batch handler.

Two built-ins:
- ``PrinterConsumer`` — the scylla-cdc-printer example
  (printer.rs:14-63): formats each change as text.
- ``ReplayConsumer`` — sequential state replay (the replicator's apply
  loop); used in tests to cross-validate the declarative LWW fold.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scylla_cdc_rust_spark.model import (
    BATCH_SEQ,
    DELETED_ELEMS_PREFIX,
    DELETED_PREFIX,
    OP_NORM,
    ORD,
    STREAM_ID,
    TTL,
    OperationType,
)


class Consumer:
    """Per-stream-group consumer; one instance per stream id."""

    def consume_batch(self, pdf: pd.DataFrame) -> None:  # pragma: no cover
        raise NotImplementedError

    def finish(self) -> pd.DataFrame | None:
        return None


ConsumerFactory = Callable[[bytes], Consumer]


def consume_streams(
    decoded: DataFrame,
    factory: ConsumerFactory,
    output_schema: str | T.StructType,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deliver the decoded log to consumers per stream, in order."""
    df = decoded
    if num_partitions:
        df = df.repartition(num_partitions, F.col(STREAM_ID))
    else:
        df = df.repartition(F.col(STREAM_ID))
    df = df.sortWithinPartitions(F.col(STREAM_ID), F.col(ORD))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        consumers: dict[bytes, Consumer] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            sid_col = pdf[STREAM_ID]
            # contiguous runs of one stream id (partition is sorted)
            boundaries = sid_col.ne(sid_col.shift()).cumsum()
            for _, chunk in pdf.groupby(boundaries, sort=False):
                sid = bytes(chunk[STREAM_ID].iloc[0])
                c = consumers.get(sid)
                if c is None:
                    c = consumers[sid] = factory(sid)
                c.consume_batch(chunk)
        for c in consumers.values():
            out = c.finish()
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, schema=output_schema)


# ---------------------------------------------------------------------------
# Built-in consumers
# ---------------------------------------------------------------------------

PRINTER_SCHEMA = "line string"


class PrinterConsumer(Consumer):
    """scylla-cdc-printer analog (printer.rs:14-63,74-99)."""

    def __init__(self, sid: bytes, payload_cols: list[str]):
        self.sid = sid.hex()
        self.cols = payload_cols
        self.lines: list[str] = []

    def consume_batch(self, pdf: pd.DataFrame) -> None:
        for d in pdf.to_dict("records"):
            op = OperationType(abs(int(d[OP_NORM]))).name
            parts = [f"stream={self.sid[:8]} ord={d[ORD]} op={op}"]
            if d.get(TTL) is not None and not pd.isna(d.get(TTL)):
                parts.append(f"ttl={int(d[TTL])}")
            for c in self.cols:
                v = d.get(c)
                if v is not None and not (isinstance(v, float) and pd.isna(v)):
                    parts.append(f"{c}={v}")
                dflag = d.get(DELETED_PREFIX + c)
                if dflag:
                    parts.append(f"deleted[{c}]")
                delems = d.get(DELETED_ELEMS_PREFIX + c)
                if delems is not None and len(delems):
                    parts.append(f"deleted_elems[{c}]={list(delems)}")
            self.lines.append(" ".join(parts))

    def finish(self) -> pd.DataFrame:
        return pd.DataFrame({"line": self.lines})


def printer(decoded: DataFrame, payload_cols: list[str]) -> DataFrame:
    return consume_streams(
        decoded, lambda sid: PrinterConsumer(sid, payload_cols), PRINTER_SCHEMA
    )


REPLAY_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "ttl long, last_ord long"
)

_W = {int(OperationType.ROW_UPDATE), int(OperationType.ROW_INSERT)}
_D = {int(OperationType.ROW_DELETE), int(OperationType.PARTITION_DELETE)}


def _as_plain(v):
    """Arrow→pandas cell to plain python: numpy arrays → list, map cells
    (list of (k, v) tuples) stay as-is, dict/scalars pass through."""
    return v.tolist() if hasattr(v, "tolist") else v


class ReplayConsumer(Consumer):
    """Sequential apply per the replicator semantics (A1–A11) — the
    row-oriented reference shape, kept as a VERIFICATION-tier
    cross-check of the declarative fold (see queries.QUERY_TIERS) and
    as the template for custom stateful consumers.  Supports all
    collection modes: atomic/list, set, map, list_delta, udt.

    ``key`` may be a composite (pk…, ck…) list; ``partition_key`` names
    its pk prefix, in which case PARTITION_DELETE kills every state row
    sharing that prefix — the A5 general form (delete_partition,
    replicator_consumer.rs:392-402; replication_tests.rs:705-777),
    matching fold.partition_tombstones so the two tiers can cross-check
    composite-key partition deletes."""

    def __init__(
        self,
        key: str | list[str] = "doc_id",
        collection_modes: dict | None = None,
        partition_key: str | list[str] | None = None,
    ):
        self.keys = [key] if isinstance(key, str) else list(key)
        self.modes = collection_modes or {"tokens": "set"}
        self.state: dict[tuple, dict] = {}
        self.payload: list[str] = []
        if partition_key is None:
            self.pk_idx: list[int] | None = None
        else:
            pks = [partition_key] if isinstance(partition_key, str) else list(partition_key)
            missing = [p for p in pks if p not in self.keys]
            if missing:
                raise ValueError(f"partition_key {missing} not part of key {self.keys}")
            self.pk_idx = [self.keys.index(p) for p in pks]

    def consume_batch(self, pdf: pd.DataFrame) -> None:
        payload = [
            c
            for c in pdf.columns
            if not c.startswith("cdc$")
            and c not in (*self.keys, OP_NORM, ORD, "is_expiration", "epoch",
                          "cdc_time_ms", "cdc_time_seq", "cdc_clock_seq",
                          "end_of_batch", "stream_bucket", "time_bucket")
        ]
        self.payload = payload
        for d in pdf.sort_values(ORD).to_dict("records"):
            op = int(d[OP_NORM])
            k = tuple(d[kc] for kc in self.keys)
            if op == OperationType.PARTITION_DELETE and self.pk_idx is not None:
                # A5 general form: kill every clustering row of the pk
                pk = tuple(k[i] for i in self.pk_idx)
                for victim in [
                    s for s in self.state
                    if tuple(s[i] for i in self.pk_idx) == pk
                ]:
                    del self.state[victim]
                continue
            if op in _D:
                self.state.pop(k, None)
                continue
            if op not in _W:
                continue
            row = self.state.setdefault(
                k, {"marker": False, "cells": {}, "ttl": None, "last_ord": -1}
            )
            if op == OperationType.ROW_INSERT:
                row["marker"] = True
            for c in payload:
                val = d.get(c)
                if isinstance(val, float) and pd.isna(val):
                    val = None
                deleted = bool(d.get(DELETED_PREFIX + c) or False)
                delems = d.get(DELETED_ELEMS_PREFIX + c)
                if delems is not None and not len(delems):
                    delems = None
                mode = self.modes.get(c, "atomic")
                if mode in ("map", "list_delta"):
                    # per-(map)key value LWW (update_map_or_set / update_list,
                    # replicator_consumer.rs:415-469,472-528); pandas gives
                    # arrow map cells as list-of-(k, v) pairs
                    val_d = dict(_as_plain(val)) if val is not None and len(val) else None
                    dele = _as_plain(delems) if delems is not None else None
                    if deleted:
                        cur = dict(val_d) if val_d else {}
                        for k2 in dele or []:
                            cur.pop(k2, None)
                        row["cells"][c] = cur or None
                    elif val_d or dele:
                        cur = dict(row["cells"].get(c) or {})
                        if val_d:
                            cur.update(val_d)
                        for k2 in dele or []:
                            cur.pop(k2, None)
                        row["cells"][c] = cur or None
                    continue
                if mode == "udt":
                    # per-field LWW (update_udt, replicator_consumer.rs:531-585)
                    dele = _as_plain(delems) if delems is not None else None
                    if deleted:
                        cur = dict(val) if val is not None else None
                    elif val is not None:
                        fieldnames = list(val)
                        cur = dict(
                            row["cells"].get(c) or {fn: None for fn in fieldnames}
                        )
                        delset = set(dele or [])
                        for i, fn in enumerate(fieldnames):
                            if val[fn] is not None:
                                cur[fn] = val[fn]
                            elif i in delset:
                                cur[fn] = None
                    else:
                        continue
                    if cur is not None and not any(
                        x is not None for x in cur.values()
                    ):
                        cur = None
                    row["cells"][c] = cur
                    continue
                if mode == "set":
                    if deleted:
                        # Overwrite resets to this change's elements; a
                        # deleted_elements entry in the SAME change still
                        # wins the same-timestamp tie (removal > add),
                        # matching the declarative fold and oracle.
                        base = (
                            set(val.tolist() if hasattr(val, "tolist") else val)
                            if val is not None and len(val)
                            else set()
                        )
                        if delems is not None:
                            base -= set(
                                delems.tolist() if hasattr(delems, "tolist") else delems
                            )
                        row["cells"][c] = sorted(base) if base else None
                    else:
                        cur = set(row["cells"].get(c) or [])
                        if val is not None and len(val):
                            cur |= set(val.tolist() if hasattr(val, "tolist") else val)
                        if delems is not None:
                            cur -= set(delems.tolist() if hasattr(delems, "tolist") else delems)
                        if (val is not None and len(val)) or delems is not None:
                            row["cells"][c] = sorted(cur) if cur else None
                else:
                    if val is not None and not (hasattr(val, "__len__") and not isinstance(val, str) and len(val) == 0):
                        row["cells"][c] = (
                            val.tolist() if hasattr(val, "tolist") else val
                        )
                    elif deleted:
                        row["cells"][c] = None
            ttl = d.get(TTL)
            row["ttl"] = None if (ttl is None or pd.isna(ttl)) else int(ttl)
            row["last_ord"] = int(d[ORD])

    def _present(self, c, v):
        """User-visible shape per mode (mirrors operators.fold.present)."""
        if v is None:
            return None
        mode = self.modes.get(c, "atomic")
        if mode == "list_delta":
            return [x for _, x in sorted(v.items())]
        return v

    def finish(self) -> pd.DataFrame:
        rows = []
        for k, row in self.state.items():
            if not (row["marker"] or any(v is not None for v in row["cells"].values())):
                continue
            rec = dict(zip(self.keys, k))
            for c in self.payload:
                rec[c] = self._present(c, row["cells"].get(c))
            rec["ttl"] = row["ttl"]
            rec["last_ord"] = row["last_ord"]
            rows.append(rec)
        return pd.DataFrame(
            rows, columns=[*self.keys, *self.payload, "ttl", "last_ord"]
        )


def replay_consumer_fold(
    decoded: DataFrame,
    collection_modes: dict | None = None,
    output_schema: str | T.StructType = REPLAY_SCHEMA,
    key: str | list[str] = "doc_id",
    partition_key: str | list[str] | None = None,
) -> DataFrame:
    """The full log folded by sequential consumers (reference-shaped path).

    ``output_schema`` must list (key, payload..., ttl, last_ord) for the
    log's payload columns — defaults to the tokenized-sequences shape.

    Contract: ONE generation at a time, like the reference (stream ids
    are generation-scoped; a key's changes move to a different stream at
    rollover, log_reader.rs:171-188).  Multi-epoch logs must be applied
    epoch-by-epoch with the generation barrier (plans/pipeline.py) —
    this function alone would emit one row per (generation, key)."""
    return consume_streams(
        decoded,
        lambda _sid: ReplayConsumer(
            key=key, collection_modes=collection_modes, partition_key=partition_key
        ),
        output_schema,
    )
