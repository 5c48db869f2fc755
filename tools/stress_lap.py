"""One-off 10x stress lap (VERDICT r17 #6): the 100-TB design claims
rest on plan shape plus sf0.1 timings; this is the cheapest remaining
evidence that the bucketed dedup/ANN shapes hold off the cliff.

Synthesizes a derived ~sf1 dataset into a scratch dir — the testdata
itself is read-only — by unioning sf0.1 ten times with remapped keys
(every BIGINT key/foreign-key column shifted by copy_index * 1e9, so
each copy is self-consistent and joins inside a copy still match;
nation/region are fixed dimensions and stay single-copy, exactly like
TPC-H). Text/embedding payloads are copied verbatim, so intra-copy
duplicate structure is preserved at 10x the document count.

Then runs the plan-audit query set at BOTH scales in one session
(bench.run_one discipline: untimed warm pass, min of two timed runs)
and reports per query:

- wall seconds at sf0.1 and at the derived sf1, and their ratio
  (data is 10x; a healthy linear-with-overheads query lands well
  under 10x because fixed costs amortize — a ratio far above 10x is
  superlinear and flagged),
- peak per-stage shuffle write bytes, plus memory-spill and
  disk-spill totals across the sf1 run's stages, via the Spark
  status REST API (the session here enables the UI; the engine's
  get_session keeps it off, which is a static conf — hence the
  local builder below). Only DISK spill flags: memoryBytesSpilled
  is the in-memory size of data that sort buffers released, a
  pressure indicator, not an I/O cliff.

Prints one JSON line per query plus a summary line; exits 1 if any
query is flagged superlinear (ratio > RATIO_CEILING) or spilled to
disk. Run-wide /proc/stat steal is recorded — interpret contaminated
laps accordingly.

Usage: python tools/stress_lap.py [src_sf_dir] [scratch_dir] [query ...]
Defaults: /root/testdata/sf0.1, $SPARK_GRAFT_STRESS_DIR or
/tmp/spark_graft_sf1_derived, and the plan-audit DEFAULT_QUERIES.
The derived dataset is built once and reused (marker file records the
source + copy count; delete the scratch dir to force a rebuild).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from experiment_flink_cdc_connectors_postgres_datastream_spark.session import RUNTIME_CONFS, configure_session
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES
from tools.plan_audit import DEFAULT_QUERIES

COPIES = 10
#: per-copy shift for every remapped BIGINT key column — far above any
#: source key space (<= 1e6 rows at sf0.1), so copies never collide
STRIDE = 1_000_000_000

#: BIGINT key/FK columns to shift per copy; every other column is
#: copied verbatim. nation/region are fixed dims (absent here).
REMAP: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

#: flagged superlinear above this sf1/sf0.1 wall-time ratio (data is
#: 10x; fixed-cost amortization puts healthy queries well under it)
RATIO_CEILING = 15.0

UI_PORT = 4047


def _cpu():
    with open("/proc/stat") as fh:
        f = [int(x) for x in fh.readline().split()[1:]]
    return sum(f), f[7] if len(f) > 7 else 0


def build_session() -> SparkSession:
    """The engine's local session shape (see session.get_session) with
    the UI enabled so the status REST API can serve stage metrics —
    spark.ui.enabled is a static conf, so get_session can't be reused."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress_lap")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)),
        )
        .getOrCreate()
    )
    return configure_session(spark)


def synthesize(spark: SparkSession, src: str, dst: str) -> None:
    marker = os.path.join(dst, "_DERIVED_OK.json")
    want = {"source": os.path.realpath(src), "copies": COPIES, "stride": STRIDE}
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == want:
                print(f"# derived dataset already at {dst}", file=sys.stderr)
                return
    os.makedirs(dst, exist_ok=True)
    for table, keys in REMAP.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        if keys:
            copies = []
            for i in range(COPIES):
                c = df
                for k in keys:
                    c = c.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast("long"))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df  # fixed dimension: single copy
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
        print(f"# wrote {table} x{COPIES if keys else 1}", file=sys.stderr)
    with open(marker, "w") as fh:
        json.dump(want, fh)


def _stages(app_id: str) -> dict[int, dict]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        return {s["stageId"]: s for s in json.load(resp)}


def run_one(spark: SparkSession, name: str, sf_dir: str) -> float:
    """bench.run_one discipline: untimed warm pass, min of two."""
    build = QUERIES[name]
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(2):
        t0 = time.time()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return round(min(times), 3)


def main() -> int:
    argv = sys.argv[1:]
    src = argv[0] if argv else "/root/testdata/sf0.1"
    dst = argv[1] if len(argv) > 1 else os.environ.get(
        "SPARK_GRAFT_STRESS_DIR", "/tmp/spark_graft_sf1_derived"
    )
    names = argv[2:] or DEFAULT_QUERIES
    unknown = sorted(set(names) - set(QUERIES))
    if unknown:
        print(f"ERROR: unknown query name(s) {unknown}; ran nothing")
        return 2
    spark = build_session()
    app_id = spark.sparkContext.applicationId
    synthesize(spark, src, dst)
    # session warmup outside all timed regions (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    t_all, s0 = _cpu()
    flagged = []
    results = {}
    for name in names:
        base = run_one(spark, name, src)
        before = set(_stages(app_id))
        big = run_one(spark, name, dst)
        new = [s for sid, s in _stages(app_id).items() if sid not in before]
        peak_shuffle = max(
            (s.get("shuffleWriteBytes", 0) for s in new), default=0
        )
        mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in new)
        disk_spill = sum(s.get("diskBytesSpilled", 0) for s in new)
        ratio = round(big / base, 2) if base > 0 else None
        superlinear = ratio is not None and ratio > RATIO_CEILING
        if superlinear or disk_spill > 0:
            flagged.append(name)
        results[name] = {
            "sf0.1_sec": base,
            "sf1_sec": big,
            "ratio": ratio,
            "peak_stage_shuffle_write_bytes": peak_shuffle,
            "mem_spill_bytes": mem_spill,
            "disk_spill_bytes": disk_spill,
            "superlinear": superlinear,
        }
        print(json.dumps({"query": name, **results[name]}))
    t_end, s1 = _cpu()
    print(json.dumps({
        "summary": True,
        "copies": COPIES,
        "ratio_ceiling": RATIO_CEILING,
        "flagged": flagged,
        "steal_pct": round(100.0 * (s1 - s0) / max(t_end - t_all, 1), 2),
        "load": os.getloadavg()[0],
    }))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
