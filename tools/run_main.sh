#!/bin/bash
# Run a graft main class directly against compiled classes + /opt/spark/jars
# (no sbt — decouples long runs from concurrent source edits/recompiles).
# Usage: tools/run_main.sh <mainClass> [args...]
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# 512m code cache mirrors build.sbt's forked javaOptions (see note
# there); GRAFT_JVM_OPTS appends/overrides for experiments.
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-16g} \
  -XX:ReservedCodeCacheSize=512m $GRAFT_JVM_OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
