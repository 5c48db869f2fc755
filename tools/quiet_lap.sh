#!/usr/bin/env bash
# Probe-then-fire headline lap (VERDICT r16 #4). The host injects
# hypervisor steal in multi-minute bursts (observed 0.3-9.7%; a 5.4x
# swing on byte-identical code in r16), and the bench discipline only
# trusts quiet laps for ratchet comparisons. The r16 methodology that
# landed the records, codified:
#
#   1. DRAIN: don't fire while the box is still busy — a full pytest
#      run leaves loadavg ~5 for minutes after it exits, inflating
#      laps by self-load without showing steal. Wait for load1 below
#      a threshold first.
#   2. PROBE: sample /proc/stat steal over a 30-45 s window and fire
#      only when the probe reads under the gate. Blind
#      retry-until-quiet burned 15 laps in r16; the probe costs ~35 s
#      and no lap.
#   3. VERIFY: a burst can still land mid-lap, so the lap's own
#      measured steal_pct is re-checked against the gate before the
#      lap is trusted.
#
# Contaminated/failed attempts go to stderr (they still upper-bound
# the quiet number); the first passing lap's JSON goes to stdout and
# the script exits 0. If NO quiet lap lands within the attempt budget
# (a burst-phase session), the fastest contaminated lap's JSON is
# printed to stdout with "contaminated": true added (VERDICT r17 #4)
# — a machine-readable upper bound instead of nothing — and the
# script still exits 1 so callers never mistake it for a quiet lap.
# A failed or non-JSON attempt is retried; its stderr is preserved in
# /tmp/quiet_lap.<pid>.log for diagnosis.
#
# Usage: tools/quiet_lap.sh [max_attempts] [probe_seconds] [gate_pct] [load_max]
set -euo pipefail
cd "$(dirname "$0")/.."
ATTEMPTS=${1:-12}
PROBE=${2:-35}
GATE=${3:-0.1}
LOADMAX=${4:-2.0}
ERRLOG="/tmp/quiet_lap.$$.log"
# test seams (tests/test_tools.py drives the exhaustion path with a
# stub lap command and zero sleeps; production defaults unchanged)
LAP_CMD=${QUIET_LAP_CMD:-"python tools/ab_headline.py"}
RETRY_SLEEP=${QUIET_LAP_RETRY_SLEEP:-30}
DRAIN_SLEEP=${QUIET_LAP_DRAIN_SLEEP:-60}
# probe seam (ADVICE r18): with probe_seconds=0 the real probe's two
# back-to-back /proc/stat reads can still catch one steal jiffy on this
# host, desyncing a stubbed lap sequence — tests stub the probe itself
PROBE_CMD=${QUIET_LAP_PROBE_CMD:-}

probe_steal() { # steal % of total cpu time over $PROBE seconds
    if [ -n "$PROBE_CMD" ]; then
        $PROBE_CMD
        return
    fi
    python3 - "$PROBE" <<'PY'
import sys, time
def snap():
    with open("/proc/stat") as fh:
        v = list(map(int, fh.readline().split()[1:]))
    return sum(v), v[7]  # (total jiffies, steal jiffies)
t0, s0 = snap()
time.sleep(float(sys.argv[1]))
t1, s1 = snap()
print(f"{100.0 * (s1 - s0) / max(1, t1 - t0):.3f}")
PY
}

lt() { python3 -c "import sys; sys.exit(0 if float(sys.argv[1]) < float(sys.argv[2]) else 1)" "$1" "$2"; }

# best (lowest-headline18) lap that fired but failed the steal gate
BEST_CONTAMINATED=""

keep_fastest() { # $1=challenger lap JSON; echoes whichever lap is faster
    # .get() with +inf default (ADVICE r18): a lap that parsed as JSON
    # (steal_pct present) but lacks headline18 must lose the compare,
    # not KeyError — under `set -e` that aborted the whole hunt and
    # skipped the exhaustion JSON. The prior best survives a bad
    # challenger; a bad lap is kept only when there is nothing else.
    python3 - "$1" "${BEST_CONTAMINATED}" <<'PY'
import json, sys
INF = float("inf")
new = json.loads(sys.argv[1])
old = json.loads(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] else None
best = new if old is None or new.get("headline18", INF) < old.get("headline18", INF) else old
print(json.dumps(best))
PY
}

for i in $(seq 1 "$ATTEMPTS"); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    if ! lt "$load" "$LOADMAX"; then
        echo "attempt $i: box not drained (load1 ${load} >= ${LOADMAX}); waiting" >&2
        sleep "$DRAIN_SLEEP"
        continue
    fi
    steal=$(probe_steal)
    if ! lt "$steal" "$GATE"; then
        echo "attempt $i: probe read ${steal}% steal over ${PROBE}s (gate ${GATE}%); not firing" >&2
        sleep "$RETRY_SLEEP"
        continue
    fi
    if ! lap=$($LAP_CMD 2>>"$ERRLOG" | tail -1); then
        echo "attempt $i: lap command failed (stderr in $ERRLOG)" >&2
        sleep "$RETRY_SLEEP"
        continue
    fi
    if ! lapsteal=$(python3 -c "import json,sys; print(json.loads(sys.argv[1])['steal_pct'])" "$lap" 2>>"$ERRLOG"); then
        echo "attempt $i: non-JSON lap output (treated as contaminated; stderr in $ERRLOG): $lap" >&2
        sleep "$RETRY_SLEEP"
        continue
    fi
    if lt "$lapsteal" "$GATE"; then
        echo "$lap"
        exit 0
    fi
    echo "attempt $i: burst landed mid-lap (steal ${lapsteal}%, probe was ${steal}%): $lap" >&2
    BEST_CONTAMINATED=$(keep_fastest "$lap")
done
echo "no quiet lap in $ATTEMPTS attempts" >&2
if [ -n "$BEST_CONTAMINATED" ]; then
    # machine-readable upper bound from a burst-phase session: the
    # fastest lap that fired, flagged so it is never ratchet-compared
    echo "$BEST_CONTAMINATED" | python3 -c \
        'import json,sys; d=json.load(sys.stdin); d["contaminated"]=True; print(json.dumps(d))'
fi
exit 1
