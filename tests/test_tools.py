"""Regression tests for the local verification tooling."""

from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_verify_local_unknown_query_name_is_a_hard_error():
    """A requested name that matches no registered query must abort
    with a non-zero exit naming the offender — before the fix it was
    silently skipped and the run printed '0 failures' having run
    NOTHING, a vacuous pass indistinguishable from a real one
    (VERDICT r11 #3). The gate fires before any Spark session."""
    res = subprocess.run(
        [
            sys.executable,
            "tools/verify_local.py",
            "/root/testdata/sf0.001",
            "definitely_not_a_query",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert res.returncode == 2
    assert "definitely_not_a_query" in res.stdout
    assert "unknown query name" in res.stdout
    assert "0 failures" not in res.stdout


def test_verify_local_unknown_flag_is_a_hard_error():
    """Same foot-gun class as the unknown-name check: a misspelled
    flag (--strict-type) used to be silently ignored, running the
    whole gate WITHOUT the strictness the caller asked for."""
    res = subprocess.run(
        [
            sys.executable,
            "tools/verify_local.py",
            "--strict-type",
            "/root/testdata/sf0.001",
            "tpch_q1",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert res.returncode == 2
    assert "--strict-type" in res.stdout
    assert "0 failures" not in res.stdout


def test_verify_local_value_hash_invariants():
    """The comparator that gates every local grade: the hash must be
    invariant under row order AND column order (the driver sorts
    columns by name before hashing), must distinguish different
    values, and must distinguish a value moving between columns."""
    sys.path.insert(0, str(REPO))
    from tools.verify_local import value_hash

    rows = [(1, "a"), (2, "b")]
    h = value_hash(rows, ["x", "y"])
    # row order irrelevant
    assert value_hash([(2, "b"), (1, "a")], ["x", "y"]) == h
    # column order irrelevant when values move with their names
    assert value_hash([("a", 1), ("b", 2)], ["y", "x"]) == h
    # different values -> different hash
    assert value_hash([(1, "a"), (2, "c")], ["x", "y"]) != h
    # same values under swapped NAMES -> different hash (a value
    # landing in the wrong column must not collide)
    assert value_hash(rows, ["y", "x"]) != h


def test_verify_local_oracle_cache_hits_and_invalidates(tmp_path, monkeypatch):
    """VERDICT r15 #7a + r16 #3 + ADVICE r16: the opt-in DuckDB-side
    memo must (a) return the byte-identical result on a hit, (b) key on
    the SQL text — a changed oracle can never serve a stale entry —
    (c) key on the data files' identity, so a regenerated sf dir
    invalidates, (d) key on the DuckDB version AND the normalize()
    source, so an engine upgrade or a normalization-rule change can
    never serve stale rows, (e) recover from a corrupt/truncated/
    wrong-shape cache entry by recomputing (never a FAIL), and (f) live
    in a user-private dir (here: tmp_path via the env override; default
    is the repo-local .oracle_cache, mode 0700). No Spark."""
    import json

    import duckdb

    sys.path.insert(0, str(REPO))
    import tools.verify_local as vl

    sf = tmp_path / "sf"
    sf.mkdir()
    cache_root = tmp_path / "cache"
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_CACHE_DIR", str(cache_root))
    con = duckdb.connect()
    for t in vl.TABLES:
        (sf / f"{t}.parquet").write_bytes(b"")  # only stat() is keyed
    sql1 = "SELECT 1 AS a, 'x' AS b"
    k1 = vl._oracle_cache_key(sql1, str(sf))
    k2 = vl._oracle_cache_key("SELECT 2 AS a, 'x' AS b", str(sf))
    assert k1 != k2  # (b) SQL text is part of the key
    cold = vl._oracle_cached(con, sql1, str(sf), use_cache=True)
    warm = vl._oracle_cached(con, sql1, str(sf), use_cache=True)
    assert cold == warm == (["a", "b"], ["INTEGER", "VARCHAR"], [(1, "x")])
    entry = cache_root / (k1 + ".json")
    assert entry.exists()
    # (f) the cache landed in the overridden (user-private) dir
    assert (cache_root.stat().st_mode & 0o777) == 0o700
    # (e) corrupt entry -> recompute, bad file dropped, then re-cached
    entry.write_text("{ truncated")
    assert vl._oracle_cached(con, sql1, str(sf), use_cache=True) == cold
    # wrong-shape entry (valid JSON, missing 'cols') -> same recovery
    entry.write_text(json.dumps({"rows": []}))
    assert vl._oracle_cached(con, sql1, str(sf), use_cache=True) == cold
    assert json.loads(entry.read_text())["cols"] == ["a", "b"]
    # non-dict valid JSON ('[]', a bare string) raised TypeError on
    # hit["cols"] and crashed the run instead of recomputing (ADVICE
    # r17); so did a rows list with non-iterable items at tuple(r)
    for bad in ("[]", '"a string"', json.dumps({"cols": ["a"], "types": [], "rows": [1]})):
        entry.write_text(bad)
        assert vl._oracle_cached(con, sql1, str(sf), use_cache=True) == cold
        assert json.loads(entry.read_text())["cols"] == ["a", "b"]
    # (d) the engine version and normalize() source are part of the key
    monkeypatch.setattr(vl.duckdb, "__version__", "999.0.0-test")
    assert vl._oracle_cache_key(sql1, str(sf)) != k1
    monkeypatch.undo()
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_CACHE_DIR", str(cache_root))
    monkeypatch.setattr(vl, "normalize", lambda v: v)
    assert vl._oracle_cache_key(sql1, str(sf)) != k1
    monkeypatch.undo()
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_CACHE_DIR", str(cache_root))
    assert vl._oracle_cache_key(sql1, str(sf)) == k1
    # (c) touching a table file's mtime/size changes the key
    (sf / f"{sorted(vl.TABLES)[0]}.parquet").write_bytes(b"xx")
    assert vl._oracle_cache_key(sql1, str(sf)) != k1


def test_quiet_lap_emits_best_contaminated_lap_on_exhaustion(tmp_path):
    """VERDICT r17 #4: in a burst-phase session where every fired lap
    is steal-contaminated, quiet_lap.sh previously exited 1 with
    nothing on stdout — no machine-readable upper bound. Now the
    FASTEST contaminated lap's JSON is printed with
    "contaminated": true added, and the exit code stays 1 so callers
    never mistake it for a quiet lap. Also pins the quiet path: a lap
    under the steal gate goes to stdout unflagged with exit 0. Drives
    the real script through its test seams (stub lap command, zero
    sleeps, instant probe)."""
    import json
    import os
    import subprocess

    stub = tmp_path / "stub_lap.py"
    counter = tmp_path / "n"
    counter.write_text("0")
    stub.write_text(
        "import json, pathlib\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()); p.write_text(str(n + 1))\n"
        "laps = [\n"
        "    {'headline18': 15.0, 'steal_pct': 2.0, 't': {}},\n"
        "    {'headline18': 12.5, 'steal_pct': 0.9, 't': {}},\n"  # fastest
        "    {'headline18': 14.0, 'steal_pct': 1.4, 't': {}},\n"
        "]\n"
        "print(json.dumps(laps[n]))\n"
    )
    env = dict(
        os.environ,
        QUIET_LAP_CMD=f"python3 {stub}",
        QUIET_LAP_RETRY_SLEEP="0",
        QUIET_LAP_DRAIN_SLEEP="0",
        # stub the probe too (ADVICE r18): with probe_seconds=0 the real
        # probe can still catch a steal jiffy between its two snapshots
        # and refuse, desyncing the stub's 3-lap sequence
        QUIET_LAP_PROBE_CMD="echo 0.000",
    )
    # exhaustion: 3 attempts, all laps over the 0.1% gate -> exit 1,
    # stdout carries the FASTEST lap flagged contaminated
    res = subprocess.run(
        ["bash", str(REPO / "tools" / "quiet_lap.sh"), "3", "0", "0.1", "999"],
        capture_output=True, text=True, env=env,
    )
    assert res.returncode == 1
    out = json.loads(res.stdout.strip())
    assert out == {
        "headline18": 12.5, "steal_pct": 0.9, "t": {}, "contaminated": True,
    }
    assert "no quiet lap in 3 attempts" in res.stderr

    # quiet path: gate above every stub lap's steal -> first lap wins,
    # unflagged, exit 0
    counter.write_text("0")
    res = subprocess.run(
        ["bash", str(REPO / "tools" / "quiet_lap.sh"), "3", "0", "5.0", "999"],
        capture_output=True, text=True, env=env,
    )
    assert res.returncode == 0
    out = json.loads(res.stdout.strip())
    assert out["headline18"] == 15.0 and "contaminated" not in out

    # ADVICE r18: a fired lap whose JSON parses (steal_pct present) but
    # lacks headline18 must not KeyError-abort the hunt under `set -e`;
    # it loses the fastest-lap compare and the exhaustion JSON still
    # carries the best WELL-FORMED contaminated lap.
    stub.write_text(
        "import json, pathlib\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()); p.write_text(str(n + 1))\n"
        "laps = [\n"
        "    {'headline18': 15.0, 'steal_pct': 2.0, 't': {}},\n"
        "    {'steal_pct': 0.9, 't': {}},\n"  # malformed: no headline18
        "    {'headline18': 14.0, 'steal_pct': 1.4, 't': {}},\n"
        "]\n"
        "print(json.dumps(laps[n]))\n"
    )
    counter.write_text("0")
    res = subprocess.run(
        ["bash", str(REPO / "tools" / "quiet_lap.sh"), "3", "0", "0.1", "999"],
        capture_output=True, text=True, env=env,
    )
    assert res.returncode == 1
    out = json.loads(res.stdout.strip())
    assert out == {
        "headline18": 14.0, "steal_pct": 1.4, "t": {}, "contaminated": True,
    }
    assert "no quiet lap in 3 attempts" in res.stderr


def test_stress_lap_remap_matches_real_schemas():
    """VERDICT r17 #6: the 10x stress lap derives ~sf1 by unioning
    sf0.1 with per-copy key shifts. The remap table must name every
    testdata table exactly once, every remapped column must exist in
    the real parquet schema as a BIGINT (shifting an INTEGER dim key
    or a typo'd column would corrupt the derived joins silently), and
    the per-copy stride must clear every source key space. pyarrow
    only — no Spark session."""
    import pyarrow.parquet as pq

    sys.path.insert(0, str(REPO))
    from tools.plan_audit import DEFAULT_QUERIES
    from tools.stress_lap import RATIO_CEILING, REMAP, STRIDE
    from experiment_flink_cdc_connectors_postgres_datastream_spark.io import TABLES

    assert set(REMAP) == set(TABLES)
    sf = "/root/testdata/sf0.001"
    for table, keys in REMAP.items():
        schema = pq.read_schema(f"{sf}/{table}.parquet")
        for k in keys:
            assert k in schema.names, (table, k)
            assert str(schema.field(k).type) == "int64", (table, k)
    # fixed dims stay single-copy; fact/entity tables are remapped
    assert REMAP["nation"] == [] and REMAP["region"] == []
    assert REMAP["lineitem"] == ["l_orderkey", "l_partkey", "l_suppkey"]
    # the stride clears any plausible source key space at sf<=1
    assert STRIDE >= 1_000_000_000 and RATIO_CEILING > 10
    # the lap covers the plan-audit set by default
    from tools.stress_lap import DEFAULT_QUERIES as _  # noqa: F401 (re-export exists)

    assert set(DEFAULT_QUERIES) >= {"similarity_topk", "tpch_q9", "minhash_recall_curve"}


def test_soak_option_scales_property_examples(monkeypatch):
    """VERDICT r16 #7b: `pytest --soak N` (carried by SPARK_GRAFT_SOAK,
    set in conftest's pytest_configure before collection imports any
    test module) makes every participating model property run N
    examples; without it, each test's own default stands."""
    sys.path.insert(0, str(REPO / "tests"))
    import soakopt

    monkeypatch.delenv("SPARK_GRAFT_SOAK", raising=False)
    assert soakopt.soak_examples(120) == 120
    monkeypatch.setenv("SPARK_GRAFT_SOAK", "1000")
    assert soakopt.soak_examples(120) == 1000
    monkeypatch.setenv("SPARK_GRAFT_SOAK", "0")
    assert soakopt.soak_examples(6) == 6
    monkeypatch.setenv("SPARK_GRAFT_SOAK", "")
    assert soakopt.soak_examples(6) == 6


def test_plan_audit_counts_and_verdicts(spark):
    """tools/plan_audit.py codifies the per-round physical-plan audit.
    Unit level: FORMATTED plans print every node twice (tree outline +
    numbered detail header), so the counter must count unique numbered
    headers — and the anti-pattern verdicts must flag BatchEvalPython /
    CartesianProduct / beyond-allowance BNLJs. Integration level: a
    real registry query's plan passes, and a row-at-a-time Python UDF
    plan is caught."""
    sys.path.insert(0, str(REPO))
    from tools.plan_audit import ALLOWED_BNLJ, audit_one, count_nodes, plan_text

    fake = (
        "== Physical Plan ==\n"
        "* HashAggregate (3)\n"
        "+- BroadcastNestedLoopJoin BuildRight (2)\n"
        "   +- Exchange (1)\n"
        "\n"
        "(1) Exchange\n"
        "(2) BroadcastNestedLoopJoin\n"
        "(3) HashAggregate\n"
    )
    assert count_nodes(fake, "BroadcastNestedLoopJoin") == 1  # not 2
    assert count_nodes(fake, "Exchange") == 1
    # allowance: dsir's documented 2 pass, a third fails
    assert audit_one("dsir_importance_weights", fake) == []
    assert ALLOWED_BNLJ["dsir_importance_weights"] == 2
    assert audit_one("some_other_query", fake) != []
    assert audit_one("q", fake + "(4) BatchEvalPython\n") != []
    assert audit_one("q", fake + "(4) CartesianProduct\n") != []

    # exchange-count ratchet (VERDICT r17 #3): a ratcheted query at its
    # recorded ceiling passes; ONE exchange beyond it fails naming the
    # ceiling; un-ratcheted names stay informational (no failure)
    from tools.plan_audit import ALLOWED_EXCHANGES

    at_ceiling = "== Physical Plan ==\n" + "".join(
        f"({i + 1}) Exchange\n" for i in range(ALLOWED_EXCHANGES["tpch_q9"])
    )
    assert audit_one("tpch_q9", at_ceiling) == []
    over = at_ceiling + f"({ALLOWED_EXCHANGES['tpch_q9'] + 1}) Exchange\n"
    problems = audit_one("tpch_q9", over)
    assert problems and "ratchet ceiling" in problems[0]
    assert audit_one("not_a_ratcheted_query", over) == []
    # the ratchet table covers exactly the default audit set
    from tools.plan_audit import DEFAULT_QUERIES

    assert set(ALLOWED_EXCHANGES) == set(DEFAULT_QUERIES)

    # a real registry plan through the same capture path: zero
    # scale-killers on the headline scan-agg
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES

    text = plan_text(QUERIES["tpch_q6"](spark, "/root/testdata/sf0.001"))
    assert "== Physical Plan ==" in text
    assert audit_one("tpch_q6", text) == []

    # a genuine row-at-a-time Python UDF IS caught by the same verdict
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    df = spark.range(10).select(slow(F.col("id")).alias("y"))
    assert "BatchEvalPython" in plan_text(df)
    assert audit_one("q", plan_text(df)) != []


def test_priority_window_is_exact_and_fully_registered():
    """The driver grades the FIRST 50 registered queries in
    registration order, and `_reorder()` silently DROPS any _PRIORITY
    name missing from the registry — so a typo in the rotated window
    would shrink it and the driver would grade a different 50th query
    than the round intended, a silent grading drift in the same class
    as the vacuous-pass foot-guns this file pins. Invariants: exactly
    50 names, no duplicates, every name registered, the registry's
    first 50 ARE the window in order, and every oracle key names a
    registered query."""
    sys.path.insert(0, str(REPO))
    from experiment_flink_cdc_connectors_postgres_datastream_spark import queries as q

    window = list(q._PRIORITY)
    assert len(window) == 50 and len(set(window)) == 50
    assert [n for n in window if n not in q.QUERIES] == []
    assert list(q.QUERIES)[:50] == window
    assert sorted(set(q.ORACLES) - set(q.QUERIES)) == []
