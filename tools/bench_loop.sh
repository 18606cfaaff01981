#!/usr/bin/env bash
# Dev tool: run graft.Bench directly on the compiled classes (no sbt),
# repeatedly, until a run lands with canary_dev <= 0.10 or the attempt
# budget is spent. Each run's JSON line is appended to the log file.
# Usage: tools/bench_loop.sh <attempts> <outlog>
set -u
ATTEMPTS="${1:-3}"
OUT="${2:-/tmp/bench_loop.jsonl}"
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
MEM="${SPARK_DRIVER_MEM:-16g}"
for i in $(seq 1 "$ATTEMPTS"); do
  echo "[bench_loop] attempt $i/$ATTEMPTS $(date -u +%H:%M:%S)" >&2
  LINE=$(java $OPTS -Xms"$MEM" -Xmx"$MEM" -XX:ReservedCodeCacheSize=1g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>/dev/null | grep '"metric":"total"' | tail -1)
  echo "$LINE" >> "$OUT"
  DEV=$(echo "$LINE" | python3 -c "import json,sys; print(json.load(sys.stdin)['canary_dev'])" 2>/dev/null)
  echo "[bench_loop] attempt $i canary_dev=$DEV" >&2
  ok=$(python3 -c "print(1 if float('${DEV:-9}') <= 0.10 else 0)")
  if [ "$ok" = "1" ]; then
    echo "[bench_loop] clean run on attempt $i" >&2
    exit 0
  fi
done
echo "[bench_loop] no clean run in $ATTEMPTS attempts" >&2
exit 1
