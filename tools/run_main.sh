#!/usr/bin/env bash
# Run a graft main class outside sbt (so sbt stays free for compile/test
# while long benches run). Uses a CLASS SNAPSHOT so a concurrent
# recompile can't swap class files under a running JVM:
#   tools/run_main.sh <snapshot-dir> <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), plus the usual SPARK_GRAFT_* vars.
set -euo pipefail
SNAP="$1"; shift
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$SNAP:/opt/spark/jars/*" "$MAIN" "$@"
