"""Golden CDC fixture: the reference README's manual walkthrough
(README.md:54-58 mutations → README.md:63-69 typed events →
README.md:108-114 final aggregate) as deterministic Debezium JSON,
plus snapshot (op='r') and delete (op='d') cases the reference lists
as untested (README.md:143)."""

from __future__ import annotations

import json


def _env(op: str, schema: str, id_: int, name: str | None, before_name: str | None, ts_ms: int, lsn: int) -> str:
    row = lambda n: {"id": id_, "full_name": n} if n is not None else None  # noqa: E731
    return json.dumps(
        {
            "before": row(before_name),
            "after": row(name),
            "source": {
                "version": "1.4.0",
                "connector": "postgresql",
                "name": "dbserver1",
                "ts_ms": ts_ms,
                "db": "experiment",
                "schema": schema,
                "table": "users",
                "txId": lsn,
                "lsn": lsn,
            },
            "op": op,
            "ts_ms": ts_ms,
        }
    )


#: README.md:54-58: 3 INSERTs then 2 UPDATEs
WALKTHROUGH = [
    _env("c", "schema1", 1, "susan smith", None, 1000, 1),
    _env("c", "schema1", 2, "anne smith", None, 2000, 2),
    _env("c", "schema2", 1, "bob smith", None, 3000, 3),
    _env("u", "schema1", 1, "sue smith", "susan smith", 4000, 4),
    _env("u", "schema2", 1, "bobby smith", "bob smith", 5000, 5),
]

#: expected final aggregate (README.md:108-114)
EXPECTED_COUNTS = {"schema1": 2, "schema2": 1}

#: snapshot read + delete extension (delete kills schema1|2)
WITH_SNAPSHOT_AND_DELETE = WALKTHROUGH + [
    _env("r", "schema3", 7, "snap shot", None, 500, 0),
    _env("d", "schema1", 2, None, "anne smith", 6000, 6),
]

EXPECTED_COUNTS_AFTER_DELETE = {"schema1": 1, "schema2": 1, "schema3": 1}
