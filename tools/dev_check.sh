#!/bin/bash
# Dev loop: compile, dump the named queries via graft.Verify at the
# given SF, then oracle-check just that dump.
#   tools/dev_check.sh q295_padding_waste[,q296_...] [sf0.01|sf0.1] [cpus]
set -e
cd "$(dirname "$0")/.."
QUERIES="$1"
SF="${2:-sf0.01}"
CPUS="${3:-8}"
OUT="/tmp/vout_dev"
rm -rf "$OUT"
sbt -batch compile > /tmp/dev_compile.log 2>&1 || { tail -30 /tmp/dev_compile.log; exit 1; }
JOPTS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JOPTS="$JOPTS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS="$CPUS" java $JOPTS -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "/root/testdata/$SF" "$OUT" "$QUERIES" 2>&1 \
  | grep -vE '^(WARNING|[0-9]+ *\[)' | tail -5
python3 tools/oracle_check.py "/root/testdata/$SF" "$OUT"
