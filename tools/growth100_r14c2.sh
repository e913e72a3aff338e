#!/bin/bash
# 100x extension for the second-continuation families.
set -u
Q="q_snapshot_update,q_stream_table_read,q_stream_neardup,q_stream_cdf_read"
OUT=/root/repo/GROWTH_r14_cont2_100.txt
: > $OUT
cd /root/repo
for pass in 1 2; do
  for dir in /root/repo/target/scale100x; do
    line=$(SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ONLY=$Q \
      java -cp "target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
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
      -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      graft.Bench 2>/dev/null | grep '"metric":"queries"' | tail -1)
    echo "pass=$pass dir=$dir $line" >> $OUT
  done
done
echo DONE >> $OUT
