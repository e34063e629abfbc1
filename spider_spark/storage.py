"""Versioned-parquet table layer — the Iceberg stand-in.

The design target is Iceberg (`MERGE INTO`, snapshot isolation, snapshot
expiry); this sandbox has no Iceberg runtime jar, so the same contract is
emulated on plain parquet with a single-writer protocol (SURVEY.md §7
"hard parts" (b)):

- a table is a directory of immutable version snapshots ``v{N}/``,
- ``_CURRENT`` is a one-line pointer file, written atomically
  (write tmp + os.replace) — readers always see a complete snapshot,
- MERGE = read current → anti-join/union → write next version → flip
  pointer.  The crawl driver is the only writer, so this is serializable
  by construction (the reference had the same property: one process,
  shixin_spider.py's single crawl loop).
- per-round commit manifests (``rounds/round_{k}.json``) pin the version
  of every table at the end of a round; resume rolls every pointer back
  to the last complete manifest — exactly Iceberg snapshot-id pinning
  (SURVEY.md §2.8 T1).

On a real cluster this module swaps for Iceberg catalog calls 1:1 (the
API is MERGE-shaped on purpose); nothing else in the engine changes.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "rounds"), exist_ok=True)

    # ------------------------------------------------------------ pointers
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_CURRENT")

    def current_version(self, table: str) -> str | None:
        try:
            with open(self._pointer(table)) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def _set_pointer(self, table: str, version: str) -> None:
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer(table))

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    # ------------------------------------------------------------ read/write
    def read(self, table: str) -> DataFrame:
        v = self.current_version(table)
        if v is None:
            raise FileNotFoundError(f"table {table} has no committed version")
        return self.spark.read.parquet(os.path.join(self._tdir(table), v))

    def write(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> str:
        """Write df as the next version and flip the pointer.

        ``partition_by`` is the Iceberg partition-spec analog: the frontier
        is partitioned by ``state`` so a dequeue scan of pending/retry rows
        prunes fetched/dead files entirely (at 10^10 rows the vast majority
        of the frontier is terminal — pruning is the difference between
        scanning the whole table and scanning the live slice)."""
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        cur = self.current_version(table)
        n = int(cur[1:]) + 1 if cur else 0
        v = f"v{n:05d}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(tdir, v))
        self._set_pointer(table, v)
        return v

    def append(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> str:
        """Iceberg-append analog: new snapshot = old data ∪ df.

        Emulation note: rewrites the table; real Iceberg appends only new
        files.  Kept append-shaped so the swap is mechanical.
        """
        if self.exists(table):
            df = self.read(table).unionByName(df)
        return self.write(table, df, partition_by)

    def merge_upsert(
        self, table: str, updates: DataFrame, key: str, partition_by: list[str] | None = None
    ) -> str:
        """MERGE INTO t USING updates ON t.key=u.key
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *.

        Replaces the reference's IntegrityError-driven upsert loop
        (db_config.py:46-54) and destructive retry-queue dequeue
        (shixin_python_sql.py:27-33) with one atomic snapshot swap.
        """
        if self.exists(table):
            base = self.read(table)
            merged = base.join(updates.select(key), on=key, how="left_anti").unionByName(updates)
        else:
            merged = updates
        return self.write(table, merged, partition_by)

    # ------------------------------------------------------------ manifests
    def commit_round(self, round_id: int, extra: dict | None = None) -> None:
        manifest = {
            "round_id": round_id,
            "tables": {
                t: self.current_version(t)
                for t in os.listdir(self.root)
                if os.path.isdir(self._tdir(t)) and t != "rounds" and self.exists(t)
            },
        }
        if extra:
            manifest.update(extra)
        path = os.path.join(self.root, "rounds", f"round_{round_id:06d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)

    def last_committed_round(self) -> int | None:
        rdir = os.path.join(self.root, "rounds")
        rounds = sorted(f for f in os.listdir(rdir) if f.startswith("round_"))
        if not rounds:
            return None
        with open(os.path.join(rdir, rounds[-1])) as f:
            return json.load(f)["round_id"]

    def restore_last_committed(self) -> int | None:
        """Roll every table pointer back to the last complete manifest.

        Versions written after the manifest (a crashed half-round) become
        unreachable — the resume-from-checkpoint semantics of T1.
        """
        rid = self.last_committed_round()
        if rid is None:
            return None
        with open(os.path.join(self.root, "rounds", f"round_{rid:06d}.json")) as f:
            manifest = json.load(f)
        for t, v in manifest["tables"].items():
            self._set_pointer(t, v)
        return rid

    def expire_snapshots(self, keep: int = 2) -> None:
        """Iceberg snapshot-expiry analog: drop all but the newest `keep`
        versions of each table (never the current one)."""
        for t in os.listdir(self.root):
            tdir = self._tdir(t)
            if t == "rounds" or not os.path.isdir(tdir):
                continue
            cur = self.current_version(t)
            versions = sorted(d for d in os.listdir(tdir) if d.startswith("v"))
            for v in versions[:-keep]:
                if v != cur:
                    shutil.rmtree(os.path.join(tdir, v), ignore_errors=True)
