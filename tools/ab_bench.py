"""Same-process A/B benchmark harness.

This host shows ±20-50% (occasionally 5-40×) cold-run variance between
separate processes — cross-process wall clocks are NOT trustworthy for
optimization decisions (measured: identical round-2 code re-run cold
ranged 2.1s-40s on the same query). The only reliable comparison is
interleaved runs inside ONE warmed session, which shares JIT state,
codegen caches, and whatever the host is doing to us equally between
variants.

Usage:
    python tools/ab_bench.py QUERY_A [QUERY_B] [--k 5] [--sf DIR]

With one query: repeat it k times (stability probe, prints each run +
median). With two: interleave A,B,A,B,… k times each and print
medians + the ratio. Queries are registry names from
``queries/__init__.py``; each run fully evaluates through the noop
writer exactly like bench.py.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES
from experiment_flink_cdc_connectors_postgres_datastream_spark.session import get_session


def main() -> int:
    # accept both `--k=5` and `--k 5` (the space form used to fall
    # through to the query list and die as "unknown query: 5")
    argv, args, opts = sys.argv[1:], [], {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                key, val = a.split("=", 1)
            elif i + 1 < len(argv):
                key, val = a, argv[i + 1]
                i += 1
            else:
                print(f"flag {a} needs a value")
                return 2
            opts[key] = val
        else:
            args.append(a)
        i += 1
    k = int(opts.get("--k", "5"))
    sf_dir = opts.get("--sf", "/root/testdata/sf0.1")
    names = args
    if not 1 <= len(names) <= 2:
        print(__doc__)
        return 2
    for n in names:
        if n not in QUERIES:
            print(f"unknown query: {n}")
            return 2

    spark = get_session("ab_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # one unmeasured warm lap per variant (scan caches, codegen)
    for n in names:
        run(n)

    def cpu():
        with open("/proc/stat") as fh:
            f = [int(x) for x in fh.readline().split()[1:]]
        return sum(f), f[7] if len(f) > 7 else 0

    t0c, s0 = cpu()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(k):
        for n in names:
            times[n].append(run(n))
    t1c, s1 = cpu()
    print(f"steal_pct {100.0 * (s1 - s0) / max(t1c - t0c, 1):.3f}  "
          f"load {__import__('os').getloadavg()[0]:.2f}")
    for n in names:
        runs = " ".join(f"{t:.3f}" for t in times[n])
        print(f"{n}: median {statistics.median(times[n]):.3f}s  runs [{runs}]")
    if len(names) == 2:
        ma, mb = (statistics.median(times[n]) for n in names)
        print(f"ratio {names[0]}/{names[1]} = {ma / mb:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
