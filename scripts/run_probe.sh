#!/bin/bash
# Dev helper (r14 optimization): run a graft main directly with java,
# bypassing sbt startup, with arbitrary -Dspark.* conf experiments.
# Usage: scripts/run_probe.sh [extra JVM flags...] -- <mainClass> [args...]
set -u
CP="/root/repo/target/scala-2.13/classes"
for j in /opt/spark/jars/*.jar; do CP="$CP:$j"; done
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
EXTRA=()
while [[ $# -gt 0 && "$1" != "--" ]]; do EXTRA+=("$1"); shift; done
shift
exec java -Xmx${SPARK_DRIVER_MEM:-20g} -XX:+UseParallelGC $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "${EXTRA[@]}" -cp "$CP" "$@"
