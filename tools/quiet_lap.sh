#!/usr/bin/env bash
# Steal-gated headline lap: run tools/ab_headline.py until a lap
# lands under the steal gate (default 0.15%), sleeping between
# attempts — the host injects multi-percent steal in bursts, and the
# bench discipline only trusts quiet laps for ratchet comparisons.
# Contaminated laps are printed to stderr (they still upper-bound the
# quiet number); the first passing lap goes to stdout and the script
# exits 0. Exits 1 if no quiet lap landed within the attempt budget.
#
# A failed or non-JSON attempt (environment hiccup, OOM, import error)
# counts as a contaminated attempt and the loop RETRIES instead of
# aborting under set -e; the attempt's stderr is preserved in
# /tmp/quiet_lap.<pid>.log for diagnosis.
#
# Usage: tools/quiet_lap.sh [max_attempts] [sleep_seconds] [gate_pct]
set -euo pipefail
cd "$(dirname "$0")/.."
ATTEMPTS=${1:-6}
SLEEP=${2:-600}
GATE=${3:-0.15}
ERRLOG="/tmp/quiet_lap.$$.log"
for i in $(seq 1 "$ATTEMPTS"); do
    if ! lap=$(python tools/ab_headline.py 2>>"$ERRLOG" | tail -1); then
        echo "attempt $i: ab_headline.py failed (stderr in $ERRLOG)" >&2
        [ "$i" -lt "$ATTEMPTS" ] && sleep "$SLEEP"
        continue
    fi
    if ! steal=$(python3 -c "import json,sys; print(json.loads(sys.argv[1])['steal_pct'])" "$lap" 2>>"$ERRLOG"); then
        echo "attempt $i: non-JSON lap output (treated as contaminated; stderr in $ERRLOG): $lap" >&2
        [ "$i" -lt "$ATTEMPTS" ] && sleep "$SLEEP"
        continue
    fi
    if python3 -c "import sys; sys.exit(0 if float(sys.argv[1]) < float(sys.argv[2]) else 1)" "$steal" "$GATE"; then
        echo "$lap"
        exit 0
    fi
    echo "attempt $i contaminated (steal ${steal}%): $lap" >&2
    [ "$i" -lt "$ATTEMPTS" ] && sleep "$SLEEP"
done
echo "no quiet lap in $ATTEMPTS attempts" >&2
exit 1
