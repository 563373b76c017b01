#!/usr/bin/env bash
# Steal-gated bench runner (VERDICT r9 #1): wait for a quiet co-tenant
# window, run bench.py, accept only if the suite phase saw little steal.
#
# Usage: tools/bench_quiet.sh [out.json] [max_attempts] [accept_jiffies]
#   out.json        accepted artifact path   (default /tmp/bench_quiet.json)
#   max_attempts    bench runs before giving up      (default 8)
#   accept_jiffies  max host_steal_jiffies_suite     (default 1200; the
#                   round-8 adjudicated artifact sat at 967)
#
# Every attempt is preserved as <out>.attempt<N> with its steal counters,
# so a rejected run is still an exhibit. The pre-gate waits for a 20 s
# window with <= 80 steal jiffies (the round-9 quiet-window criterion)
# before even starting the JVM.
set -u
OUT="${1:-/tmp/bench_quiet.json}"
MAX="${2:-8}"
ACCEPT="${3:-1200}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
cd "$(dirname "$0")/.."

steal() { awk '/^cpu /{print $9; exit}' /proc/stat; }

for i in $(seq 1 "$MAX"); do
  # pre-gate: a 20s window with <=80 steal jiffies
  for _ in $(seq 1 90); do
    s0=$(steal); sleep 20; s1=$(steal)
    d=$((s1 - s0))
    echo "pre-gate window: ${d} jiffies/20s" >&2
    [ "$d" -le 80 ] && break
  done
  att="${OUT}.attempt${i}"
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    python3 bench.py >"$att" 2>"${att}.err"
  suite=$(python3 -c "import json,sys; print(json.load(open('$att'))['host_steal_jiffies_suite'])" 2>/dev/null || echo 999999)
  total=$(python3 -c "import json,sys; d=json.load(open('$att')); print(d['value'])" 2>/dev/null || echo "?")
  echo "attempt $i: suite=${total}s suite_steal=${suite}" >&2
  if [ "$suite" -le "$ACCEPT" ]; then
    cp "$att" "$OUT"
    echo "ACCEPTED attempt $i -> $OUT" >&2
    exit 0
  fi
done
echo "no attempt met the steal gate (<=$ACCEPT); best-effort artifacts kept as ${OUT}.attempt*" >&2
exit 1
