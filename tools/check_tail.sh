#!/usr/bin/env bash
# Tail-contract regression check (r16 verdict item 2): the driver keeps
# only the LAST 2000 chars of the bench's combined stdout+stderr and
# json-parses the last line that looks like the compact bench line.
# r13-r16 saw four different tail-delivery failures (oversized line,
# stderr reordering, mid-retry kill, WARN spam eviction); this script
# simulates the driver's capture on a short bench run that INCLUDES a
# streaming query (the r16 WARN-spam source) and fails unless the
# simulated tail still contains a parseable JSON line.
# Usage: tools/check_tail.sh   (needs target/scala-2.13/classes built)
set -u
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=$(mktemp)
# q225 is a streaming-epoch query (emits the ResolveWriteToStream WARN
# unless Bench silences it); q01 is the cheap scan-agg canary.
SPARK_GRAFT_ONLY="q01_flagship_revenue,q225_stream_sink" \
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}" \
SPARK_GRAFT_WARM_DIR="" \
SPARK_GRAFT_BENCH_DIAG=/tmp/check_tail_diag.jsonl \
java $OPTS -Xmx8g -Dspark.ui.enabled=false \
  -cp "$CP" graft.Bench > "$OUT" 2>&1
RC=$?
python3 - "$OUT" "$RC" <<'EOF'
import json, sys
raw = open(sys.argv[1], errors="replace").read()
rc = int(sys.argv[2])
tail = raw[-2000:]
ok = None
for line in tail.splitlines():
    line = line.strip()
    if line.startswith("{") and '"metric":"total"' in line:
        try:
            ok = json.loads(line)
        except json.JSONDecodeError:
            pass
if rc != 0:
    print(f"[check_tail] FAIL: bench exited rc={rc}")
    sys.exit(1)
if ok is None:
    print("[check_tail] FAIL: no parseable bench line in last 2000 chars")
    print("--- simulated tail ---")
    print(tail)
    sys.exit(1)
print(f"[check_tail] PASS: tail has parseable line, nq={ok['nq']}, "
      f"value={ok['value']}, canary_dev={ok['canary_dev']}")
EOF
