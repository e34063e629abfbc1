"""Foreign (operational-store) sink escape hatch — S5/S10 as CONNECTORS.

The reference lands rows in MySQL with dup-key-skip inserts and in Mongo
with keyed upserts (flask_spider/spider/public/db_config.py:16-61;
phone_book.py:219-221 ``insert ignore`` analog).  The engine's TableStore
is the analytical home for crawl state, but a real deployment also needs
to push rows OUT to an operational store (serving DB, queue, search
index).  This module is that seam, Spark-shaped:

- ``df.foreachPartition``: each partition opens ONE client connection
  (the per-partition session rule, T5), writes in bounded batches, and
  closes — the driver never sees a row, so the sink scales with
  executors, not driver memory.
- **At-least-once × keyed-idempotent = effectively-once.**  Spark may
  re-run a partition on task retry/speculation, so the sink requires a
  KEY and delegates dup handling to the store's unique-key semantics
  (INSERT IGNORE / upsert) — exactly the reference's contract.  A
  non-keyed append sink under task retries would double-write; this API
  makes that impossible to express by accident.
- Rows are deduplicated on the key within the job first (same
  first-wins rule as the S5 batch sink), so a retried batch re-sends
  identical rows and the store's dup-skip makes the retry a no-op.

``make_writer`` is injectable (tests use a file-backed fake with O_EXCL
dup-key semantics; a deployment passes a pymysql/pymongo/ES client
factory).  For JDBC-speaking stores prefer Spark's native
``df.write.jdbc`` (predicate-pushdown reads, parallel writes); this seam
is for everything JDBC can't reach.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class ForeignWriter:
    """Contract for an operational-store client (duck-typed; subclassing
    is optional).  ``upsert_batch(rows)`` MUST be idempotent on the key
    (unique-key insert-ignore or replace) and returns the number of rows
    newly written — skipped duplicates don't count.  ``close()`` releases
    the connection."""

    def upsert_batch(self, rows: list[dict]) -> int:  # pragma: no cover
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - optional
        pass


def write_foreign(
    df: DataFrame,
    make_writer: Callable[[int], ForeignWriter],
    key: str,
    batch_size: int = 1000,
) -> int:
    """Push ``df`` to an operational store via per-partition batched
    keyed upserts; returns the number of rows the store reports as newly
    written (accumulator-summed across tasks; task retries re-send
    identical batches and count 0 new, so the total is exact under the
    writer's idempotence contract).

    ``make_writer(partition_id)`` runs ON THE EXECUTOR once per
    partition — it must be picklable and open its own connection (never
    capture a live client from the driver)."""
    if key not in df.columns:
        raise ValueError(f"key column {key!r} not in DataFrame: {df.columns}")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    sc = df.sparkSession.sparkContext
    written = sc.accumulator(0)

    # first-wins within the job (S5 rule): a deterministic representative
    # per key so a task retry re-sends byte-identical rows.
    other = [c for c in df.columns if c != key]
    deduped = (
        df.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    *([F.col(c) for c in other] or [F.col(key)])
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    def sink_partition(rows: Iterator) -> None:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        writer = None
        batch: list[dict] = []
        try:
            for row in rows:
                if writer is None:
                    writer = make_writer(pid)
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    written.add(writer.upsert_batch(batch))
                    batch = []
            if batch:
                if writer is None:
                    writer = make_writer(pid)
                written.add(writer.upsert_batch(batch))
        finally:
            if writer is not None:
                writer.close()

    deduped.foreachPartition(sink_partition)
    return written.value


class FileBackedKeyStore(ForeignWriter):
    """A real cross-process unique-key store over a directory: one file
    per key, created with O_EXCL so concurrent writers race safely and
    the FIRST insert wins — the INSERT IGNORE semantics the reference
    relies on, usable from test executors (local-mode python workers are
    separate processes, so an in-memory fake cannot observe writes).

    Used by tests as the injected client; a deployment's writer wraps
    pymysql/pymongo the same way."""

    def __init__(self, root: str, key: str):
        import os

        self.root = root
        self.key = key
        os.makedirs(root, exist_ok=True)

    def upsert_batch(self, rows: list[dict]) -> int:
        import hashlib
        import json
        import os

        n_new = 0
        for r in rows:
            kv = str(r[self.key])
            fname = hashlib.md5(kv.encode()).hexdigest() + ".json"
            try:
                fd = os.open(
                    os.path.join(self.root, fname),
                    os.O_WRONLY | os.O_CREAT | os.O_EXCL,
                )
            except FileExistsError:
                continue  # dup-key skip: first writer won
            with os.fdopen(fd, "w") as f:
                json.dump(r, f, default=str)
            n_new += 1
        return n_new

    def read_all(self) -> list[dict]:
        import json
        import os

        out = []
        for fn in os.listdir(self.root):
            with open(os.path.join(self.root, fn)) as f:
                out.append(json.load(f))
        return out


def batched(it: Iterable, size: int) -> Iterator[list]:
    """Utility: chunk an iterable into lists of ``size``."""
    batch: list = []
    for x in it:
        batch.append(x)
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch
