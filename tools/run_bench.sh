#!/bin/bash
# Bench wrapper — runs graft.Bench at sf0.1 and REFUSES to let a noisy or
# contended record pass silently (the round-6 lesson: one contaminated
# query anchored a headline ratio while contended=false). Round 8 makes the
# record SELF-HEALING: a disqualified run is retried (bounded attempts,
# polling /proc/loadavg < 1.0 between tries) so a contended record can never
# be what a round archives by default — BENCH_r07.json was exactly that: the
# wrapper detected contention (exit 4) but the contaminated JSON still
# became the committed record and read as a phantom 2.4x regression.
# If every attempt is dirty, the LAST run is emitted with a top-level
# "no_clean_run" marker spliced in, so a consumer scanning only the JSON
# still sees the disqualification.
# Exit codes:
#   0  clean record (contended=false, noisy=[]) — possibly after retries
#   3  all attempts noisy (per-query interference — min times carry an
#      asterisk; $OUT carries "no_clean_run")
#   4  all attempts contended (box busy — $OUT carries "no_clean_run")
#   5  failed queries (a throwing query's near-zero "time" must never
#      anchor a recorded total; retrying cannot fix broken code)
#   6  the bench JVM itself crashed / emitted no parseable JSON
# Usage: bash tools/run_bench.sh            # sf0.1
#        SF=... OUT=... ATTEMPTS=... IDLE_WAIT_SECS=... bash tools/run_bench.sh
set -eo pipefail
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
OUT=${OUT:-/tmp/bench_last.json}
ATTEMPTS=${ATTEMPTS:-3}
IDLE_WAIT_SECS=${IDLE_WAIT_SECS:-300}   # max wait for loadavg < 1.0 per attempt
sbt -batch compile -error
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED"

wait_for_idle() {
  local waited=0 load
  while :; do
    load=$(cut -d' ' -f1 /proc/loadavg)
    if python3 -c "import sys; sys.exit(0 if float('$load') < 1.0 else 1)"; then
      return 0
    fi
    if [ "$waited" -ge "$IDLE_WAIT_SECS" ]; then
      echo "== loadavg still $load after ${waited}s — running anyway (bench self-detects)" >&2
      return 0
    fi
    echo "== box busy (loadavg $load) — waiting for idle (${waited}/${IDLE_WAIT_SECS}s)" >&2
    sleep 10; waited=$((waited + 10))
  done
}

# classify $OUT: prints the exit class (0/3/4/5/6) on stdout
classify() {
  python3 - "$1" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception as e:
    print(f"== bench emitted no parseable JSON ({e})", file=sys.stderr)
    print(6); sys.exit(0)
noisy, contended = d.get("noisy", []), d.get("contended", False)
failed = d.get("failed", [])
if failed:
    print(f"== FAILED queries {failed} — see the .stderr sidecar;"
          " this run records NOTHING", file=sys.stderr)
    print(5)
elif contended:
    print(f"== CONTENDED run (noisy={noisy}, loadavg={d['loadavg_start_end']})"
          " — self-disqualified", file=sys.stderr)
    print(4)
elif noisy:
    print(f"== NOISY queries {noisy} — their mins carry an asterisk",
          file=sys.stderr)
    print(3)
else:
    print(f"== clean record: total {d['value']}s, max spread "
          f"{max(d['spread'].values())}s", file=sys.stderr)
    print(0)
EOF
}

rc=6
for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "== bench attempt $attempt/$ATTEMPTS" >&2
  wait_for_idle
  # keep stderr in a sidecar (per-query failure traces live there); with
  # pipefail a crashed JVM propagates its exit status instead of tail's 0
  if ! SPARK_GRAFT_SF_DIR="$SF" java $ADD_OPENS -Xmx8g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench 2>"${OUT%.json}.stderr" | tail -1 > "$OUT"; then
    echo "== bench JVM crashed (see ${OUT%.json}.stderr) — attempt $attempt" >&2
    rc=6
    continue
  fi
  rc=$(classify "$OUT")
  [ "$rc" -eq 0 ] && break          # clean — archive it
  [ "$rc" -eq 5 ] && break          # broken queries — retrying cannot help
done

cat "$OUT"
if [ "$rc" -eq 3 ] || [ "$rc" -eq 4 ]; then
  # splice the disqualification into the record itself: the marker travels
  # with the JSON even when the exit code is lost (e.g. a driver that
  # archives $OUT unconditionally)
  python3 - "$OUT" "$ATTEMPTS" <<'EOF'
import json, sys
path, attempts = sys.argv[1], int(sys.argv[2])
d = json.load(open(path))
d["no_clean_run"] = True
d["attempts"] = attempts
open(path, "w").write(json.dumps(d, separators=(",", ":")) + "\n")
print(f"== NO CLEAN RUN in {attempts} attempts — $OUT carries"
      " no_clean_run=true; do not read its totals as a regression",
      file=sys.stderr)
EOF
fi
exit "$rc"
