#!/usr/bin/env bash
# Compile a handful of .scala files against /opt/spark/jars + an existing
# classes dir WITHOUT sbt (so long sbt test runs don't block iteration).
# Usage: fastc.sh CLASSES_DIR file1.scala [file2.scala ...]
# Output classes land in CLASSES_DIR (overwriting the sbt-built ones).
set -euo pipefail
CLASSES_DIR=$1; shift
# Locate the scala-compiler/library/reflect jars from the local coursier cache
# (any mirror layout) without hardcoding a repository hostname.
find_jar() {
  local name=$1
  find "${COURSIER_CACHE:-$HOME/.cache/coursier}" /root/.sbt -name "${name}-2.13.*.jar" 2>/dev/null | sort | tail -1
}
SC=$(find_jar scala-compiler); SL=$(find_jar scala-library); SR=$(find_jar scala-reflect)
[ -n "$SC" ] && [ -n "$SL" ] && [ -n "$SR" ] || { echo "scala compiler jars not found in coursier/sbt caches" >&2; exit 1; }
CP="$CLASSES_DIR:$(echo /opt/spark/jars/*.jar | tr ' ' ':')"
exec java -cp "$SC:$SL:$SR" \
  scala.tools.nsc.Main -classpath "$CP" -d "$CLASSES_DIR" "$@"
