#!/usr/bin/env bash
# Run a graft main directly on the compiled classes + /opt/spark/jars,
# bypassing sbt (so long measurement jobs don't hold the sbt lock while
# development continues). Mirrors build.sbt's fork JVM options.
#   tools/runjava.sh [-cp <classes-dir>] <mainClass> [args...]
set -euo pipefail
CLASSES="/root/repo/target/scala-2.13/classes"
if [ "${1:-}" = "-cp" ]; then CLASSES="$2"; shift 2; fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -XX:+UnlockDiagnosticVMOptions \
  -XX:GCLockerRetryAllocationCount=100 \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
