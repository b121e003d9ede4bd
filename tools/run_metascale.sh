#!/bin/bash
# Plain-java launcher for graft.MetaScale — decoupled from sbt so long
# metadata-scale cells can run while sbt serves tests/benches.
# Usage: run_metascale.sh <out.jsonl> <sizesCsv> <codecsCsv> [mode]
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.MetaScale "$@"
