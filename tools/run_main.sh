#!/bin/bash
# Run a graft main class directly against the compiled classes + Spark
# jars — no sbt lock, so long probes can run in parallel with sbt work.
# Usage: MEM=24g tools/run_main.sh graft.tools.SteadyStateProbe args...
set -euo pipefail
MAIN="$1"; shift
MEM="${MEM:-8g}"
# Snapshot the compiled classes so a concurrent `sbt compile` cannot
# change class files under a long-running JVM (lazily-loaded classes
# would mix compilation eras -> NoSuchMethod/NoClassDefFound mid-run).
SNAP="$(mktemp -d /tmp/graft-classes-XXXX)"
trap 'rm -rf "$SNAP"' EXIT
cp -r /root/repo/target/scala-2.13/classes/. "$SNAP"/
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# no exec: the trap must clean the snapshot after the JVM exits
java $ADD_OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" \
  "$MAIN" "$@"
