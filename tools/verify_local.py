"""Local stand-in for the driver's correctness gate: run every
registry query on Spark AND its DuckDB oracle, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/verify_local.py [--strict-types] [--oracle-cache]
       [sf_dir] [query ...]

``--oracle-cache`` (VERDICT r15 #7a) memoizes the DuckDB side of the
compare under ``<repo>/.oracle_cache/`` (override:
``$SPARK_GRAFT_ORACLE_CACHE_DIR``; repo-local + mode 0700 per ADVICE
r16 — never a world-shared /tmp path another user could pre-seed),
keyed on the md5 of (oracle SQL text, resolved sf_dir, per-table
parquet size+mtime, ``duckdb.__version__``, the source of
``normalize``) — any change to the query's oracle, the scale factor,
the data, the DuckDB engine, or the value-normalization rules
invalidates the entry (VERDICT r16 #3: without the version a duckdb
upgrade would silently serve stale oracle rows), so a hit is always
the byte-identical result DuckDB would return. A corrupt or truncated
cache entry is deleted and recomputed, never surfaced as a failure.
The SPARK side always runs (it is the thing being verified); the
cache only cuts the redundant oracle re-runs in full-registry
multi-scale sweeps. Results whose values don't survive a JSON
round-trip (BLOBs) are transparently not cached.

``--strict-types`` additionally FAILS any oracle whose DuckDB result
column type is outside the portable set (BIGINT / DOUBLE / VARCHAR /
BOOLEAN / TIMESTAMP / DATE). The value-normalizing comparison below
cannot see HUGEINT / DECIMAL drift (a HUGEINT renders like a BIGINT
locally but a type-sensitive renderer in the driver's environment may
not) — round 8 proved that by passing a query the driver failed — so
the type gate is the local detector for that divergence class.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import TABLES
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import ORACLES, QUERIES
from experiment_flink_cdc_connectors_postgres_datastream_spark.session import get_session


def value_hash(rows: list[tuple], columns: list[str]) -> str:
    """Order-insensitive hash: sort columns by name, render rows as
    repr strings, sort, md5."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    rendered = sorted("|".join(repr(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def normalize(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        return round(v, 9)
    return v


#: oracle output types every engine/version renders identically; see
#: the module docstring (--strict-types). Fixed-width exact integers
#: (TINYINT/SMALLINT/INTEGER/BIGINT) are all portable — the drift
#: class this gate exists for is WIDE/VARIABLE types (HUGEINT,
#: DECIMAL) that a type-sensitive renderer can print differently
#: across DuckDB versions (the round-8 red row).
PORTABLE_TYPES = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "TIMESTAMP",
    "DATE",
}


def _oracle_cache_key(sql: str, sf_dir: str) -> str:
    import inspect
    import os

    h = hashlib.md5()
    h.update(sql.encode())
    # engine + normalization identity (VERDICT r16 #3): a cached row is
    # only byte-identical to a fresh run if the SAME duckdb version
    # executes it and the SAME normalize() renders it
    h.update(duckdb.__version__.encode())
    h.update(inspect.getsource(normalize).encode())
    real = os.path.realpath(sf_dir)
    h.update(real.encode())
    for t in sorted(TABLES):
        p = os.path.join(real, f"{t}.parquet")
        try:
            st_ = os.stat(p)
            h.update(f"{t}:{st_.st_size}:{st_.st_mtime_ns}".encode())
        except OSError:
            h.update(f"{t}:absent".encode())
    return h.hexdigest()


def _cache_dir() -> str:
    """Repo-local, user-private cache location (ADVICE r16): a
    world-shared /tmp dir with predictable keys would let another user
    pre-seed entries and silently alter what a correctness-gating tool
    reports."""
    import os

    return os.environ.get(
        "SPARK_GRAFT_ORACLE_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".oracle_cache",
        ),
    )


def _oracle_cached(con, sql: str, sf_dir: str, use_cache: bool):
    """(cols, types, rows) for the oracle, through the opt-in cache.
    Types are cached as their rendered names — exactly what the
    strict-types gate compares against PORTABLE_TYPES."""
    import json
    import os

    cache_dir = _cache_dir()
    path = None
    if use_cache:
        path = os.path.join(cache_dir, _oracle_cache_key(sql, sf_dir) + ".json")
        try:
            with open(path) as fh:
                hit = json.load(fh)
            return hit["cols"], hit["types"], [tuple(r) for r in hit["rows"]]
        except OSError:
            pass
        except (ValueError, KeyError, TypeError):
            # corrupt/truncated entry, missing field, or wrong-shaped
            # valid JSON — a non-dict entry ('[]', a bare string) hits
            # TypeError on hit["cols"], as does a rows list with
            # non-iterable items at tuple(r) (ADVICE r17): recompute
            # instead of misreporting a passing query as a "duckdb
            # error" FAIL, and drop the bad file
            try:
                os.unlink(path)
            except OSError:
                pass
    res = con.sql(sql)
    cols = [d[0] for d in res.description]
    types = [str(t) for t in res.types]
    rows = [tuple(normalize(v) for v in r) for r in res.fetchall()]
    if path is not None:
        try:
            payload = json.dumps({"cols": cols, "types": types, "rows": rows})
            # round-trip guard: only cache what decodes back identical
            back = json.loads(payload)
            if [tuple(r) for r in back["rows"]] == rows:
                os.makedirs(cache_dir, mode=0o700, exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "w") as fh:
                    fh.write(payload)
                os.replace(tmp, path)
        except (TypeError, ValueError, OSError):
            pass  # unserializable (BLOBs) or disk trouble: just don't cache
    return cols, types, rows


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    # same foot-gun class as the unknown-name check below: a
    # misspelled flag (--strict-type) would silently run WITHOUT the
    # type gate — the strictness the caller asked for vacuously off
    unknown_flags = sorted(
        {a for a in sys.argv[1:] if a.startswith("--")}
        - {"--strict-types", "--oracle-cache"}
    )
    if unknown_flags:
        print(
            "ERROR: unknown flag(s) "
            f"{unknown_flags}: only --strict-types / --oracle-cache are "
            "supported; ran nothing"
        )
        return 2
    strict_types = "--strict-types" in sys.argv[1:]
    oracle_cache = "--oracle-cache" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    # A name that matches no registered query must be a hard error,
    # not a silent skip: before this check, a misspelled argument
    # yielded "0 failures" with ZERO queries run — a vacuous pass that
    # reads exactly like a real one (VERDICT r11 #3). Checked before
    # the Spark session so the typo fails in milliseconds.
    unknown = sorted(only - set(QUERIES))
    if unknown:
        print(f"ERROR: unknown query name(s) {unknown}: not in the registry; ran nothing")
        return 2
    spark = get_session("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(normalize(v) for v in r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dcols, dtypes, drows = _oracle_cached(
                con, ORACLES[name], sf_dir, oracle_cache
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if strict_types:
            bad = [f"{c}:{t}" for c, t in zip(dcols, dtypes) if t not in PORTABLE_TYPES]
            if bad:
                problems.append(f"non-portable oracle types {bad}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems and value_hash(srows, scols) != value_hash(drows, dcols):
            problems.append("value hash mismatch")
            sset = {tuple(r[i] for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
            dset = {tuple(r[i] for i in sorted(range(len(dcols)), key=lambda i: dcols[i])) for r in drows}
            for x in list(sset - dset)[:3]:
                problems.append(f"  spark-only: {x}")
            for x in list(dset - sset)[:3]:
                problems.append(f"  duck-only:  {x}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
