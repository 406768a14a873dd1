#!/usr/bin/env bash
# Build the Catalyst extension jar (native/presto-truffle-ext.jar) using
# the Scala compiler BUNDLED inside the Spark distribution — no external
# scalac/sbt needed (r6: the r3-r5 "no scalac in container" block was
# about the standalone binary; scala-compiler-2.13.17.jar ships in
# $SPARK_JARS and runs via `java -cp ... scala.tools.nsc.Main`).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
OUT="$REPO/native/classes"
JAR="$REPO/native/presto-truffle-ext.jar"

rm -rf "$OUT" && mkdir -p "$OUT"
java -cp "$SPARK_JARS/*" scala.tools.nsc.Main \
  -classpath "$SPARK_JARS/*" \
  -d "$OUT" \
  "$REPO"/native/src/*.scala
jar cf "$JAR" -C "$OUT" .
rm -rf "$OUT"
echo "built $JAR"
jar tf "$JAR"
