"""Iceberg-shaped table catalog with a parquet fallback.

north_rule mandates Iceberg tables for the frontier, seen-set shards,
politeness state and round checkpoints. This facade is the single
place table DDL/commit semantics live:

- with an Iceberg catalog configured on the session (the jars are not
  in this sandbox, but `spark.sql.catalog.<name>` + warehouse dir is
  all a deployment adds), every operation is real Iceberg:
  ``CREATE TABLE ... USING iceberg PARTITIONED BY``, snapshot-isolated
  ``writeTo().append()``, time travel via ``VERSION AS OF``.
- without one (this sandbox), the same API runs on parquet dirs with
  atomic snapshot markers — the commit protocol StateStore
  (streaming/rounds.py) already uses, lifted to named tables.

Either way callers never see the storage choice: partition specs,
appends, snapshot reads and rollbacks have one code path each.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        return bool(impl)
    except Exception:
        return False


class CrawlCatalog:
    """Named crawl-state tables (frontier, seen, bloom_shards,
    host_policies, metrics) behind one create/append/read/snapshot API.
    """

    def __init__(
        self, spark: SparkSession, root: str, catalog: str = "crawl"
    ) -> None:
        self.spark = spark
        self.root = root
        self.catalog = catalog
        self.iceberg = iceberg_available(spark, catalog)
        if not self.iceberg:
            os.makedirs(root, exist_ok=True)

    # -- naming ------------------------------------------------------------

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.db.{name}"

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta(self, name: str) -> str:
        return os.path.join(self._dir(name), "_snapshots.json")

    # -- DDL ---------------------------------------------------------------

    def create_table(
        self, name: str, schema_ddl: str, partitioned_by: list[str] | None = None
    ) -> None:
        if self.iceberg:
            parts = (
                f" PARTITIONED BY ({', '.join(partitioned_by)})"
                if partitioned_by
                else ""
            )
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {self._ident(name)} "
                f"({schema_ddl}) USING iceberg{parts}"
            )
            return
        os.makedirs(self._dir(name), exist_ok=True)
        if not os.path.exists(self._meta(name)):
            self._write_meta(name, {"schema": schema_ddl,
                                    "partitioned_by": partitioned_by or [],
                                    "snapshots": []})

    def _read_meta(self, name: str) -> dict:
        with open(self._meta(name)) as f:
            return json.load(f)

    def _write_meta(self, name: str, meta: dict) -> None:
        tmp = self._meta(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta(name))  # atomic commit point

    # -- writes ------------------------------------------------------------

    def append(self, name: str, df: DataFrame, batch_id: int | None = None) -> int:
        """Snapshot-append; returns the new snapshot id.

        ``batch_id`` makes the append IDEMPOTENT: if any committed
        snapshot already carries this batch id, the call is a no-op
        returning that snapshot — the idempotence record and the data
        commit are ONE atomic operation (the snapshot entry itself, via
        _write_meta's os.replace / Iceberg's snapshot summary), so no
        crash window exists between "data committed" and "batch marked"
        (a separate marker file would reopen that window and make a
        replayed streaming micro-batch double-append).
        """
        if self.iceberg:
            if batch_id is not None:
                dup = self.spark.sql(
                    f"SELECT snapshot_id FROM {self._ident(name)}.snapshots "
                    f"WHERE summary['batch-id'] = '{int(batch_id)}'"
                ).first()
                if dup is not None:
                    return int(dup[0])
                df.writeTo(self._ident(name)).option(
                    "snapshot-property.batch-id", str(int(batch_id))
                ).append()
            else:
                df.writeTo(self._ident(name)).append()
            row = self.spark.sql(
                f"SELECT max(snapshot_id) FROM {self._ident(name)}.snapshots"
            ).first()
            return int(row[0])
        meta = self._read_meta(name)
        if batch_id is not None:
            for s in meta["snapshots"]:
                if s.get("batch_id") == batch_id:
                    return s["id"]  # replay: already committed
        snap_id = len(meta["snapshots"])
        part_dir = os.path.join(self._dir(name), f"snap={snap_id}")
        writer = df.write.mode("overwrite")
        if meta["partitioned_by"]:
            writer = writer.partitionBy(*meta["partitioned_by"])
        writer.parquet(part_dir)
        entry = {"id": snap_id, "ts": time.time()}
        if batch_id is not None:
            entry["batch_id"] = batch_id
        # data files first, then ONE atomic meta replace commits both
        # the snapshot and its batch-id record; an orphan data dir from
        # a crash before this line is invisible to read() (which lists
        # paths from meta) and safely overwritten on replay.
        meta["snapshots"].append(entry)
        self._write_meta(name, meta)
        return snap_id

    # -- reads -------------------------------------------------------------

    def read(self, name: str, as_of: int | None = None) -> DataFrame:
        """Current table, or time travel to snapshot ``as_of``."""
        if self.iceberg:
            if as_of is None:
                return self.spark.table(self._ident(name))
            return self.spark.sql(
                f"SELECT * FROM {self._ident(name)} VERSION AS OF {as_of}"
            )
        meta = self._read_meta(name)
        snaps = [s["id"] for s in meta["snapshots"]]
        if as_of is not None:
            snaps = [s for s in snaps if s <= as_of]
        if not snaps:
            return self.spark.createDataFrame([], meta["schema"])
        paths = [
            os.path.join(self._dir(name), f"snap={s}") for s in snaps
        ]
        return self.spark.read.parquet(*paths)

    def snapshots(self, name: str) -> list[int]:
        if self.iceberg:
            rows = self.spark.sql(
                f"SELECT snapshot_id FROM {self._ident(name)}.snapshots "
                f"ORDER BY committed_at"
            ).collect()
            return [int(r[0]) for r in rows]
        return [s["id"] for s in self._read_meta(name)["snapshots"]]

    def rollback(self, name: str, snapshot_id: int) -> None:
        """Discard snapshots after ``snapshot_id`` (crash recovery)."""
        if self.iceberg:
            self.spark.sql(
                f"CALL {self.catalog}.system.rollback_to_snapshot"
                f"('db.{name}', {snapshot_id})"
            )
            return
        meta = self._read_meta(name)
        meta["snapshots"] = [
            s for s in meta["snapshots"] if s["id"] <= snapshot_id
        ]
        self._write_meta(name, meta)
