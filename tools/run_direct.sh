#!/bin/bash
# Direct JVM launcher for graft mains — bypasses sbt (lock + ~30 s JVM
# spin-up) for fast measure/iterate loops during optimization rounds.
# Usage: tools/run_direct.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 48g), plus whatever the main reads.
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
  "$@"
