"""MERGE-capable lake table: bucketed copy-on-write parquet snapshots.

The north rule's sink is ``MERGE INTO`` an Iceberg table.  Iceberg jars
are not available in this sandbox, so this module provides the same
contract with the same scale characteristics on plain parquet:

- the table is hash-bucketed on the merge key (`doc_id`) into
  ``num_buckets`` buckets — the analog of Iceberg's bucket partition
  transform.  At 100 TB you set buckets in the thousands so a merge
  touches ~|changed keys| / |keyspace| of the data;
- a merge rewrites ONLY the buckets containing changed keys
  (copy-on-write at bucket granularity, like Iceberg COW with partition
  pruning on the join);
- commits are atomic: data files land under a new version directory,
  a manifest (bucket → data-dir pointers, schema) is written, and a
  `_VERSION` pointer file is flipped with an atomic rename.  Readers
  resolve `_VERSION` → manifest → files, so a crashed merge leaves only
  orphan files, never a torn table (the snapshot-isolation property the
  reference gets from Scylla's per-statement atomicity plus idempotent
  re-apply, cdc_types.rs:253-257).

If an Iceberg-enabled Spark session is available, ``IcebergMergeTable``
(bottom) shows the equivalent MERGE INTO statement; it is import-gated.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.operators.fold import apply_delta, with_bookkeeping

BUCKET_COL = "__bucket"


def bucket_of(key_col, num_buckets: int):
    return F.pmod(F.xxhash64(key_col), F.lit(num_buckets)).cast("int")


class ParquetMergeTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_buckets: int = 32,
        key: str = "doc_id",
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.num_buckets = num_buckets
        os.makedirs(path, exist_ok=True)

    # ---------- manifest / version plumbing ----------

    def version(self) -> int | None:
        vf = os.path.join(self.path, "_VERSION")
        if not os.path.exists(vf):
            return None
        with open(vf) as f:
            return int(f.read().strip())

    def _manifest(self, v: int | None = None) -> dict | None:
        v = v if v is not None else self.version()
        if v is None:
            return None
        with open(os.path.join(self.path, f"manifest-{v}.json")) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        from scylla_cdc_rust_spark.operators.faults import retry_with_backoff

        def _write() -> None:
            v = manifest["version"]
            mf = os.path.join(self.path, f"manifest-{v}.json")
            with open(mf, "w") as f:
                json.dump(manifest, f)
            fd, tmp = tempfile.mkstemp(dir=self.path, prefix="_VERSION.")
            with os.fdopen(fd, "w") as f:
                f.write(str(v))
            os.replace(tmp, os.path.join(self.path, "_VERSION"))  # atomic flip

        # transient store IO retries with backoff; fatal errors propagate
        # (R1/R2, stream_reader.rs:97-186) — safe to re-run: the flip is
        # atomic and idempotent for a fixed manifest
        retry_with_backoff(_write)

    # ---------- reads ----------

    def _read_paths(self, paths: list[str]) -> DataFrame:
        return self.spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, p) for p in paths]
        )

    def read(
        self,
        buckets: list[int] | None = None,
        at_version: int | None = None,
    ) -> DataFrame | None:
        """Internal state incl. tombstones and bookkeeping columns.

        ``at_version`` time-travels to an older snapshot (Iceberg's
        ``VERSION AS OF``): every commit keeps its manifest, so any
        version not yet expired by ``vacuum`` resolves to its exact
        bucket→file mapping."""
        m = self._manifest(at_version)
        if m is None:
            return None
        sel = m["buckets"]
        if buckets is not None:
            sel = {b: p for b, p in sel.items() if int(b) in set(buckets)}
        if not sel:
            return None
        return self._read_paths(sorted(set(sel.values())))

    def read_visible(self, at_version: int | None = None) -> DataFrame | None:
        df = self.read(at_version=at_version)
        if df is None:
            return None
        return df.where(~F.col("is_deleted")).drop("__has_marker", "is_deleted", BUCKET_COL)

    def snapshots(self) -> list[dict]:
        """All snapshots still resolvable on disk, oldest first — the
        analog of Iceberg's snapshot log (metadata ``snapshots`` list).
        Driver-side directory listing: one entry per manifest, never a
        Spark job."""
        out = []
        for name in sorted(os.listdir(self.path)):
            if not (name.startswith("manifest-") and name.endswith(".json")):
                continue
            with open(os.path.join(self.path, name)) as f:
                m = json.load(f)
            out.append(
                {
                    "version": m["version"],
                    "committed_at_ms": m.get("committed_at_ms"),
                    "n_buckets": len(m["buckets"]),
                }
            )
        return sorted(out, key=lambda s: s["version"])

    def changed_buckets(self, v_from: int, v_to: int) -> list[int]:
        """Buckets whose data pointer differs between two snapshots —
        the partition-pruning step of an incremental read (manifest
        diff, driver-side, no job)."""
        a = (self._manifest(v_from) or {"buckets": {}})["buckets"]
        b = (self._manifest(v_to) or {"buckets": {}})["buckets"]
        return sorted(
            int(k) for k in set(a) | set(b) if a.get(k) != b.get(k)
        )

    def read_changes(self, v_from: int, v_to: int) -> DataFrame | None:
        """Net row-level changes between two snapshots, as a changelog
        (Iceberg's ``create_changelog_view`` analog): one row per key
        whose visible state differs, with ``change_type`` in
        INSERT / UPDATE / DELETE and the new visible payload (null for
        DELETE).

        Scale shape: only buckets whose manifest pointer changed are
        read on either side (manifest diff prunes the rest), and the
        two sides are combined WITHOUT a join: both snapshots stream
        into one tagged union and a single per-key hash aggregate picks
        each side's row — one exchange over the pruned buckets, no
        exchange on either snapshot side, no sort (the full-outer SMJ
        this replaces cost 2 exchanges + 2 sorts).  The cost is
        O(|changed buckets|), independent of table size.  The one
        remaining exchange is inherent to vanilla-Spark parquet reads
        (the scan cannot report its bucket partitioning); on the real
        Iceberg sink the same diff runs exchange-free via
        storage-partitioned joins on the bucket transform.  The engine
        therefore both consumes CDC and can emit CDC downstream.
        """
        cb = self.changed_buckets(v_from, v_to)
        if not cb:
            return None
        book = ["__has_marker", "is_deleted", BUCKET_COL]
        old = self.read(buckets=cb, at_version=v_from)
        new = self.read(buckets=cb, at_version=v_to)
        vis = lambda df: df.where(~F.col("is_deleted")).drop(*book)  # noqa: E731
        if new is None:
            new = None if old is None else vis(old).limit(0)
        else:
            new = vis(new)
        if old is None:
            return new.withColumn("change_type", F.lit("INSERT"))
        old = vis(old)
        # schema evolution between the snapshots: compare on the union
        # of payload columns, padding the missing side with typed nulls
        # (a column add alone therefore does NOT flag unchanged rows —
        # old null == new null for rows the add never touched)
        payload = list(dict.fromkeys(
            [c for c in new.columns if c != self.key]
            + [c for c in old.columns if c != self.key]
        ))
        ntypes = {f.name: f.dataType for f in new.schema.fields}
        otypes = {f.name: f.dataType for f in old.schema.fields}

        def pad(df, types):
            cols = []
            for c in payload:
                if c in types:
                    want = ntypes[c] if c in ntypes else types[c]
                    col = F.col(c).cast(want) if types[c] != want else F.col(c)
                else:
                    col = F.lit(None).cast(ntypes[c] if c in ntypes else otypes[c])
                cols.append(col.alias(c))
            return df.select(F.col(self.key), F.struct(*cols).alias("__s"))

        o = pad(old, otypes).select(
            self.key, F.lit(False).alias("__is_new"), "__s"
        )
        nw = pad(new, ntypes).select(
            self.key, F.lit(True).alias("__is_new"), "__s"
        )
        # full-outer-by-aggregation: each visible side has ≤1 row per
        # key, so first(ignorenulls) over the tagged union reconstructs
        # the (old, new) pair with one map-side-combinable aggregate
        j = (
            o.unionByName(nw)
            .groupBy(self.key)
            .agg(
                F.first(F.when(~F.col("__is_new"), F.col("__s")), True).alias(
                    "__old"
                ),
                F.first(F.when(F.col("__is_new"), F.col("__s")), True).alias(
                    "__new"
                ),
            )
        )
        return (
            j.withColumn(
                "change_type",
                F.when(F.col("__old").isNull(), F.lit("INSERT"))
                .when(F.col("__new").isNull(), F.lit("DELETE"))
                .when(F.col("__old") != F.col("__new"), F.lit("UPDATE")),
            )
            .where(F.col("change_type").isNotNull())
            .select(
                self.key,
                *[F.col(f"__new.{c}").alias(c) for c in payload],
                "change_type",
            )
        )

    # ---------- merge ----------

    def merge(
        self,
        delta: DataFrame,
        payload: list[str] | None = None,
        collection_modes: dict[str, str] | None = None,
        keys_hint: DataFrame | None = None,
        assume_all_buckets: bool = False,
        affected_buckets: list[int] | None = None,
    ) -> dict:
        """Apply a fold_delta batch; rewrite only affected buckets.

        ``keys_hint``: optionally the (cheaper) pre-fold batch — affected
        buckets are derived from its key column with a column-pruned scan
        instead of materializing the delta twice.

        ``affected_buckets``: the caller already knows the delta's bucket
        set (``bucket_of(key, num_buckets)`` over the batch keys) — skip
        the pruning scan entirely.  ``apply_window`` piggybacks this on
        the per-stream lineage aggregate so one job serves both (a
        separate pruning job used to pay the window's whole
        decode+filter materialization, ~1.5 s per window at bench sf1.0).

        ``assume_all_buckets``: bulk mode — when a batch spans a whole
        epoch its keys hit essentially every bucket, so skip the pruning
        scan (always correct; pruning is an optimization for small
        incremental windows).
        """
        t0 = time.time()
        delta = delta.withColumn(BUCKET_COL, bucket_of(F.col(self.key), self.num_buckets))
        # affected buckets: tiny driver-side list (≤ num_buckets ints) —
        # the partition-pruning step of the MERGE
        if assume_all_buckets:
            affected = list(range(self.num_buckets))
        elif affected_buckets is not None:
            affected = [int(b) for b in affected_buckets]
        else:
            src = keys_hint if keys_hint is not None else delta
            affected = [
                r[0]
                for r in src.select(
                    bucket_of(F.col(self.key), self.num_buckets).alias(BUCKET_COL)
                )
                .distinct()
                .collect()
            ]
        if not affected:
            return {"buckets_rewritten": 0, "rows_written": 0, "seconds": 0.0}

        # ---- schema evolution (column adds / type widenings) ----
        import json as _json

        from pyspark.sql import types as T

        from scylla_cdc_rust_spark.operators.fold import _payload_from_delta
        from scylla_cdc_rust_spark.operators.schema_evolution import diff_schemas

        delta_payload = payload or _payload_from_delta(delta, self.key)
        incoming_types: dict[str, T.DataType] = {}
        dschema = {f.name: f.dataType for f in delta.schema.fields}
        for c in delta_payload:
            if f"{c}__v" in dschema:
                incoming_types[c] = dschema[f"{c}__v"]
            elif f"{c}__alive" in dschema:
                incoming_types[c] = dschema[f"{c}__alive"]
        m0 = self._manifest()
        stored_struct = None
        if m0 is not None and m0.get("schema"):
            full = T.StructType.fromJson(_json.loads(m0["schema"]))
            book = {self.key, "ttl", "last_ord", "__has_marker", "is_deleted", BUCKET_COL}
            stored_struct = T.StructType(
                [f for f in full.fields if f.name not in book]
            )
        evolved, _added, needs_rewrite = diff_schemas(stored_struct, incoming_types)
        extra_payload = [
            f.name for f in (stored_struct.fields if stored_struct else [])
            if f.name not in delta_payload
        ]
        if needs_rewrite and m0 is not None:
            # widening: every existing bucket is rewritten once with casts
            affected = sorted(set(affected) | {int(b) for b in m0["buckets"]})

        current = self.read(buckets=affected)
        if current is not None and stored_struct is not None:
            for f in stored_struct.fields:
                if f.name in evolved and evolved[f.name] != f.dataType:
                    current = current.withColumn(
                        f.name, F.col(f.name).cast(evolved[f.name])
                    )
        if current is None:
            from scylla_cdc_rust_spark.operators.fold import finalize

            new_state = with_bookkeeping(
                finalize(
                    delta.drop(BUCKET_COL),
                    key=self.key,
                    payload=payload,
                    collection_modes=collection_modes,
                )
            )
        else:
            new_state = apply_delta(
                current.drop(BUCKET_COL),
                delta.drop(BUCKET_COL),
                key=self.key,
                payload=delta_payload,
                collection_modes=collection_modes,
                extra_payload=extra_payload,
            )
        new_state = new_state.withColumn(
            BUCKET_COL, bucket_of(F.col(self.key), self.num_buckets)
        )

        stats = self._commit_cow(new_state, affected)
        return {
            **stats,
            "rows_written": None,  # no extra count job; lineage lives in watermarks
            "seconds": time.time() - t0,
        }

    def _commit_cow(
        self,
        new_state: DataFrame,
        affected: list[int],
        schema_json: str | None = None,
    ) -> dict:
        """COW tail shared by ``merge`` / ``delete_keys``: write the
        affected buckets under a new version dir and flip the manifest.
        ``new_state`` must already carry ``BUCKET_COL``.

        ``schema_json``: the manifest's table-level schema to commit.
        ``merge`` omits it (evolution flows through the delta, so
        ``new_state``'s schema IS the evolved table schema); schema-
        preserving rewrites (``delete_keys``) MUST pass the previous
        manifest schema — rebuilding it from the affected buckets alone
        would silently drop evolved columns that only other buckets'
        files carry, and the next merge would then rewrite those buckets
        without the column (permanent data loss)."""
        old_v = self.version()
        new_v = (old_v or 0) + 1
        rel = f"data/v{new_v}"
        out_dir = os.path.join(self.path, rel)
        # one job writes all affected buckets as partition dirs; repartition
        # by bucket first so each task owns whole buckets — Spark's dynamic
        # partition writer otherwise falls back to a per-task sort across
        # all open writers, which anti-scales with thread count.  (A wider
        # spread — k×|affected| partitions to smooth bucket→task hash
        # collisions — was A/B'd at 8× and measured ~1.8× SLOWER on the
        # write stage: the empty no-op tasks and k× shuffle blocks cost
        # more than the balance gain at any merge size the bench sees.)
        new_state.repartition(len(affected), F.col(BUCKET_COL)).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(out_dir)

        old_m = self._manifest() or {"buckets": {}, "schema": None}
        buckets = dict(old_m["buckets"])
        for b in affected:
            bdir = f"{rel}/{BUCKET_COL}={b}"
            if os.path.isdir(os.path.join(self.path, bdir)):
                buckets[str(b)] = bdir
            else:
                buckets.pop(str(b), None)  # bucket became empty
        self._commit(
            {
                "version": new_v,
                "buckets": buckets,
                "num_buckets": self.num_buckets,
                "key": self.key,
                "schema": schema_json
                or new_state.drop(BUCKET_COL).schema.json(),
                "committed_at_ms": int(time.time() * 1000),
            }
        )
        return {"version": new_v, "buckets_rewritten": len(affected)}

    def delete_keys(self, keys: DataFrame) -> dict:
        """Physically REMOVE the given keys' rows (bucket-pruned COW
        anti-join rewrite) — the reset step of
        ``plans.pipeline.repair_span``.

        Unlike a tombstone merge this erases the rows' bookkeeping
        (``last_ord``), so a subsequent re-fold of the keys' complete
        history starts from a clean slate instead of being dropped by
        the staleness gate.  Not part of the CDC apply path — replayed
        deletes go through the normal tombstone merge."""
        t0 = time.time()
        m0 = self._manifest()
        if m0 is None:
            return {"buckets_rewritten": 0, "seconds": 0.0}
        keys = keys.select(self.key).distinct()
        affected = [
            r[0]
            for r in keys.select(
                bucket_of(F.col(self.key), self.num_buckets).alias(BUCKET_COL)
            )
            .distinct()
            .collect()
            if str(r[0]) in m0["buckets"]
        ]
        if not affected:
            return {"buckets_rewritten": 0, "seconds": 0.0}
        current = self.read(buckets=affected)
        # join strategy left to AQE: a narrow repair broadcasts the key
        # set, a massive one falls back to a shuffled anti-join
        new_state = current.join(keys, self.key, "left_anti").withColumn(
            BUCKET_COL, bucket_of(F.col(self.key), self.num_buckets)
        )
        # a delete is schema-preserving at TABLE level: carry the old
        # manifest schema forward (see _commit_cow docstring)
        stats = self._commit_cow(new_state, affected, schema_json=m0["schema"])
        return {**stats, "seconds": time.time() - t0}

    # ---------- maintenance ----------

    def vacuum(
        self,
        tombstone_horizon_ord: int | None = None,
        retain_versions: int = 1,
    ) -> None:
        """Drop version dirs not referenced by any retained manifest;
        optionally purge tombstones older than a watermark horizon.

        ``retain_versions``: how many trailing snapshots stay
        time-travelable (Iceberg's ``expire_snapshots`` retain-last) —
        their manifests and every bucket dir they reference survive;
        older manifests are deleted so ``snapshots()`` only lists
        resolvable versions."""
        m = self._manifest()
        if m is None:
            return
        if tombstone_horizon_ord is not None:
            df = self.read()
            kept = df.where(
                ~F.col("is_deleted") | (F.col("last_ord") >= tombstone_horizon_ord)
            )
            new_v = m["version"] + 1
            rel = f"data/v{new_v}"
            kept = kept.withColumn(BUCKET_COL, bucket_of(F.col(self.key), self.num_buckets))
            kept.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
                os.path.join(self.path, rel)
            )
            buckets = {}
            for b in range(self.num_buckets):
                bdir = f"{rel}/{BUCKET_COL}={b}"
                if os.path.isdir(os.path.join(self.path, bdir)):
                    buckets[str(b)] = bdir
            m = {**m, "version": new_v, "buckets": buckets}
            self._commit(m)
        # bucket-dir granularity: a long windowed replay supersedes a few
        # buckets per version — dropping only whole version dirs would
        # leak every superseded bucket inside still-referenced versions
        # (unbounded growth at 10^10 events)
        cur_v = m["version"]
        retained = [
            s["version"]
            for s in self.snapshots()
            if s["version"] > cur_v - max(1, retain_versions)
        ]
        referenced = {
            os.path.normpath(os.path.join(self.path, p))
            for v in retained
            for p in (self._manifest(v) or {"buckets": {}})["buckets"].values()
        }
        # expire manifests older than the retained window
        for name in os.listdir(self.path):
            if name.startswith("manifest-") and name.endswith(".json"):
                v = int(name[len("manifest-"):-len(".json")])
                if v not in retained:
                    os.remove(os.path.join(self.path, name))
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            import shutil

            for d in sorted(os.listdir(data_root)):
                vdir = os.path.join(data_root, d)
                if not os.path.isdir(vdir):
                    continue
                for b in sorted(os.listdir(vdir)):
                    bdir = os.path.join(vdir, b)
                    if b.startswith(f"{BUCKET_COL}=") and (
                        os.path.normpath(bdir) not in referenced
                    ):
                        shutil.rmtree(bdir, ignore_errors=True)
                # only write markers (_SUCCESS/.crc) left ⇒ drop the version
                if not any(
                    e.startswith(f"{BUCKET_COL}=") for e in os.listdir(vdir)
                ):
                    shutil.rmtree(vdir, ignore_errors=True)


class IcebergMergeTable:
    """The production sink: the replicator's apply step as an Iceberg
    ``MERGE INTO`` (SURVEY §1.3 maps the destination to Iceberg; the
    reference's replicator writes to a real second cluster,
    replicator_consumer.rs:866-883).

    Input contract — one FINALIZED row per key plus ``is_deleted``
    (``finalize(fold_delta(batch))`` shape): insert when new, LWW-gated
    update when the delta's ``last_ord`` is not stale (the same
    staleness rule as ``apply_delta``/R6, making re-merges of a
    replayed window idempotent), delete on tombstone.

    Requires the Iceberg runtime jars + a configured Spark catalog —
    neither exists in this sandbox, so construction raises
    ``NotImplementedError`` with the probe result, and the integration
    contract test (tests/test_iceberg.py) skips cleanly here and runs
    for real wherever the jars are present.
    """

    def __init__(self, spark: SparkSession, table: str, key: str = "doc_id"):
        catalog = table.split(".", 1)[0] if "." in table else "spark_catalog"
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:  # noqa: BLE001 - missing conf key
            impl = None
        if not impl or "iceberg" not in impl.lower():
            raise NotImplementedError(
                f"no Iceberg catalog at spark.sql.catalog.{catalog} "
                f"(found: {impl!r}) — configure the iceberg-spark-runtime "
                "jar and a SparkCatalog to use this sink; the parquet COW "
                "sink (ParquetMergeTable) is the jar-free equivalent"
            )
        self.spark, self.table, self.key = spark, table, key

    def merge(self, delta: DataFrame) -> None:
        cols = [c for c in delta.columns if c != "is_deleted"]
        sets = ", ".join(f"t.{c} = d.{c}" for c in cols)
        names = ", ".join(cols)
        vals = ", ".join(f"d.{c}" for c in cols)
        fresh = "(t.last_ord IS NULL OR d.last_ord >= t.last_ord)"
        delta.createOrReplaceTempView("__cdc_delta")
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING __cdc_delta d ON t.{self.key} = d.{self.key}
            WHEN MATCHED AND d.is_deleted AND {fresh} THEN DELETE
            WHEN MATCHED AND NOT d.is_deleted AND {fresh}
                THEN UPDATE SET {sets}
            WHEN NOT MATCHED AND NOT d.is_deleted
                THEN INSERT ({names}) VALUES ({vals})
            """
        )
