#!/bin/bash
# Run a graft main (graft.Verify / graft.Bench / tools) directly with java,
# bypassing sbt (same JVM flags as build.sbt's javaOptions). Extra JVM flags
# can be passed via GRAFT_JAVA_FLAGS.
MAIN=$1; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# repo root derived from this script's location; Spark jars overridable
REPO=$(cd "$(dirname "$0")/../.." && pwd)
SPARK_JARS=${SPARK_JARS_DIR:-/opt/spark/jars}
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-24g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC $GRAFT_JAVA_FLAGS \
  -cp "$REPO/target/scala-2.13/classes:$SPARK_JARS/*" "$MAIN" "$@"
