#!/bin/bash
# Bench wrapper — runs graft.Bench at sf0.1 and REFUSES to let a noisy or
# contended record pass silently (the round-6 lesson: one contaminated
# query anchored a headline ratio while contended=false). Exit codes:
#   0  clean record
#   3  noisy queries present (per-query interference — min times carry an
#      asterisk; re-run before recording)
#   4  contended (box busy or multi-query/extreme interference — the run
#      self-disqualifies)
#   5  failed queries (a throwing query's near-zero "time" must never
#      anchor a recorded total)
# Usage: bash tools/run_bench.sh            # sf0.1
#        SF=... OUT=... bash tools/run_bench.sh
set -e
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
OUT=${OUT:-/tmp/bench_last.json}
sbt -batch compile -error
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED"
# keep stderr in a sidecar (per-query failure traces live there)
SPARK_GRAFT_SF_DIR="$SF" java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench 2>"${OUT%.json}.stderr" | tail -1 > "$OUT"
cat "$OUT"
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
noisy, contended = d.get("noisy", []), d.get("contended", False)
failed = d.get("failed", [])
if failed:
    print(f"== FAILED queries {failed} — see the .stderr sidecar;"
          " this run records NOTHING", file=sys.stderr)
    sys.exit(5)
if contended:
    print(f"== CONTENDED run (noisy={noisy}, loadavg={d['loadavg_start_end']})"
          " — self-disqualified, re-run on an idle box", file=sys.stderr)
    sys.exit(4)
if noisy:
    print(f"== NOISY queries {noisy} — their mins carry an asterisk;"
          " re-run before recording", file=sys.stderr)
    sys.exit(3)
print(f"== clean record: total {d['value']}s, max spread "
      f"{max(d['spread'].values())}s", file=sys.stderr)
EOF
