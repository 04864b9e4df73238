"""Custom Python DataSource WRITER: the ``auditsink`` format — the write
side of the custom-DataSource story (``sources/registry.py`` is the read
side). Writes each partition as a JSON-lines part file plus a per-partition
audit record (row count, integer value checksum), then commits a single
manifest naming exactly the parts that succeeded — the two-phase
commit/abort contract a production sink needs for exactly-once batch
output (task retries write fresh UUIDs; only COMMITTED parts enter the
manifest, so readers ignore orphans from failed attempts).

Scale design: every ``write`` call is partition-local (no driver
coordination until commit); the commit message carries only (part path,
n_rows, checksum) — bytes per partition, never data — so the driver-side
manifest write is O(partitions). Abort removes any parts the failed
attempt managed to create.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class AuditCommit(WriterCommitMessage):
    part_file: str
    n_rows: int
    checksum: int


def _remove_parts(messages) -> None:
    """Abort-path cleanup shared by the batch and per-epoch writers —
    same single-definition rationale as _manifest."""
    for m in messages:
        if m is not None and os.path.exists(m.part_file):
            os.remove(m.part_file)


def _manifest(messages) -> dict:
    """Manifest body shared by the batch and per-epoch commit paths — one
    place defines the part list, row count, and checksum modulus, so the
    two kinds of manifest can never drift apart."""
    done = sorted((m for m in messages if m is not None), key=lambda m: m.part_file)
    return {
        "parts": [
            {"file": os.path.basename(m.part_file), "n_rows": m.n_rows,
             "checksum": m.checksum}
            for m in done
        ],
        "n_rows": sum(m.n_rows for m in done),
        "checksum": sum(m.checksum for m in done) % (1 << 61),
    }


class AuditSinkWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self._path = options["path"]
        self._audit_col = options.get("audit_col")

    def write(self, iterator) -> AuditCommit:
        os.makedirs(self._path, exist_ok=True)
        part = os.path.join(self._path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        checksum = 0
        with open(part, "w") as f:
            for row in iterator:
                d = row.asDict(recursive=True)
                f.write(json.dumps(d, default=str) + "\n")
                n += 1
                if self._audit_col is not None:
                    v = d.get(self._audit_col)
                    if v is not None:
                        checksum = (checksum + int(v)) % (1 << 61)
        return AuditCommit(part_file=part, n_rows=n, checksum=checksum)

    def commit(self, messages) -> None:
        with open(os.path.join(self._path, "_MANIFEST.json"), "w") as f:
            json.dump(_manifest(messages), f, indent=1)

    def abort(self, messages) -> None:
        _remove_parts(messages)


class AuditSinkStreamWriter(DataSourceStreamWriter):
    """Streaming side of the sink: same partition-local parts + audit
    records, but committed PER EPOCH — each micro-batch lands an
    epoch manifest ``_MANIFEST-<batchId>.json`` naming only that batch's
    succeeded parts. Replayed epochs (restart after a commit-side crash)
    overwrite their own manifest idempotently; a reader that consumes
    manifests in batchId order observes exactly-once output."""

    def __init__(self, options) -> None:
        self._path = options["path"]
        self._audit_col = options.get("audit_col")

    def write(self, iterator) -> AuditCommit:
        return AuditSinkWriter(
            {"path": self._path, "audit_col": self._audit_col}
        ).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        manifest = {"batch_id": batchId, **_manifest(messages)}
        with open(os.path.join(self._path, f"_MANIFEST-{batchId}.json"), "w") as f:
            json.dump(manifest, f, indent=1)

    def abort(self, messages, batchId: int) -> None:
        _remove_parts(messages)


class AuditSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "auditsink"

    def writer(self, schema, overwrite: bool) -> AuditSinkWriter:
        return AuditSinkWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> AuditSinkStreamWriter:
        return AuditSinkStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(AuditSinkDataSource)
