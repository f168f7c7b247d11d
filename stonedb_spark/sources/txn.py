"""Transactional ingest — BEGIN / COMMIT / ROLLBACK visibility parity.

The reference runs inserts inside MySQL transactions: issues_tx417.test
pins that a committed INSERT is visible and a rolled-back one is not;
issue1510.test pins that BEGIN..COMMIT and autocommit inserts read the
same afterwards.  (Internally the delta store buffers the rows and the
commit publishes them — storage/tianmu/core/delta_table.h:37.)

Spark mapping: a *staged append*.  Files are written under a
``_staging_<txid>`` directory INSIDE the target table directory —
Spark/Hadoop file listings skip paths whose last segment starts with
``_`` or ``.``, so in-flight rows are invisible to every concurrent
reader (read isolation for free).  COMMIT moves the finished part
files into the table root (same-filesystem rename — atomic per file,
metadata-only, no data copy at any scale); ROLLBACK deletes the
staging directory.  This is the same publish pattern Spark's own
FileOutputCommitter v1 uses for task output.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


class StagedTransaction:
    """One staged-append transaction against a parquet table directory.

    Usage::

        txn = StagedTransaction(table_dir)
        txn.write(df)          # repeatable; rows NOT yet visible
        txn.commit()           # atomic publish — rows visible
        # or txn.rollback()    # discard — as if nothing happened

    A transaction is single-writer (one txid = one staging dir); table
    readers need no coordination.  Commit is idempotent-safe in the
    sense that a crash BEFORE any rename publishes nothing and a crash
    mid-commit publishes a prefix of the files — the reference has the
    same torn-commit window (its commit marks delta rows in sequence);
    callers needing all-or-nothing across files should layer a manifest
    (sources/shards.py) on top.
    """

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.txid = uuid.uuid4().hex[:12]
        self.staging = os.path.join(table_dir, f"_staging_{self.txid}")
        self._state = "open"

    def write(self, df: DataFrame) -> None:
        if self._state != "open":
            raise RuntimeError(f"transaction is {self._state}")
        df.write.mode("append").parquet(self.staging)

    def _parts(self) -> list[str]:
        if not os.path.isdir(self.staging):
            return []
        return [
            f
            for f in os.listdir(self.staging)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]

    def commit(self) -> int:
        """Publish the staged files into the table root; returns the
        number of files published."""
        if self._state != "open":
            raise RuntimeError(f"transaction is {self._state}")
        n = 0
        for f in self._parts():
            # prefix with txid: unique names, no clobbering concurrent loads
            os.rename(
                os.path.join(self.staging, f),
                os.path.join(self.table_dir, f"tx{self.txid}-{f}"),
            )
            n += 1
        shutil.rmtree(self.staging, ignore_errors=True)
        self._state = "committed"
        return n

    def rollback(self) -> None:
        if self._state != "open":
            raise RuntimeError(f"transaction is {self._state}")
        shutil.rmtree(self.staging, ignore_errors=True)
        self._state = "rolled_back"
