#!/bin/bash
# Usage: tools/run_bench.sh [sfDir] [cpus]
SF=${1:-/root/testdata/sf0.1}
CPUS=${2:-32}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" java $ADD_OPENS -Xmx16g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
  graft.Bench
