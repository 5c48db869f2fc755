"""Headline-18 ratchet probe: times bench.BENCH_QUERIES (min-of-2 per
query via bench.run_one, same warm discipline) in whatever checkout the
cwd points at, printing one JSON line with run-wide /proc/stat steal.
Used to A/B round commits in interleaved adjacent processes."""
import json
import os
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402
from experiment_flink_cdc_connectors_postgres_datastream_spark.session import get_session  # noqa: E402


def cpu():
    with open("/proc/stat") as fh:
        f = [int(x) for x in fh.readline().split()[1:]]
    return sum(f), f[7] if len(f) > 7 else 0


spark = get_session("ab_headline")
spark.range(1_000_000).selectExpr("sum(id)").collect()
sf = "/root/testdata/sf0.1"
warm = spark.read.parquet(f"{sf}/nation.parquet")
warm.join(warm.select("n_nationkey"), "n_nationkey").groupBy("n_regionkey").count().write.format("noop").mode("overwrite").save()
t0c, s0 = cpu()
t = {}
for n in bench.BENCH_QUERIES:
    t[n] = bench.run_one(spark, n, sf)
t1c, s1 = cpu()
print(json.dumps({
    "headline18": round(sum(t.values()), 3),
    "steal_pct": round(100.0 * (s1 - s0) / max(t1c - t0c, 1), 2),
    "load": os.getloadavg()[0],
    "t": t,
}))
