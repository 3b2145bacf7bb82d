#!/bin/bash
# Run a graft main class with plain java against the Spark 4 jars,
# without holding the sbt project lock. Usage:
#   scripts/runmain.sh [CLASSES_DIR] graft.Bench [args...]
# If the first arg is a directory it is used as the classes dir
# (lets long benchmarks run from a snapshot while sbt recompiles).
# The two -XX flags below MUST match build.sbt's forked-JVM options:
# the 240 MB default code cache runs 73% full under the battery (inside
# the NMethodSweeper's aggressive-flush zone) and the default
# PerMethodRecompilationCutoff=400 parks deopt-cycling generated kernels
# interpreted — both measured in round 13; dropping them silently
# reverts the bench to the r12 pathology. Bench stamps the active flag
# set into BENCH_FULL as "jvm_flags" so artifacts self-describe.
set -euo pipefail
CLASSES="/root/repo/target/scala-2.13/classes"
if [ -d "${1:-}" ] && [[ "${1:-}" != graft.* ]]; then
  CLASSES="$1"; shift
fi
exec java -XX:+IgnoreUnrecognizedVMOptions \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  --enable-native-access=ALL-UNNAMED \
  -Djdk.reflect.useDirectMethodHandleAccessor=false \
  -Xmx100g \
  -XX:ReservedCodeCacheSize=1g \
  -XX:PerMethodRecompilationCutoff=10000 \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
