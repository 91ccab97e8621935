#!/usr/bin/env bash
# Local standalone Spark cluster on loopback — the sandbox stand-in for a
# real multi-executor cluster.  Each worker/executor is its own JVM: on
# this host a single JVM saturates around 8 effective cores, so
# multi-executor is how >8 cores actually scale (same as any real
# cluster).  Usage: tools/cluster.sh start [n_workers] | stop | status
set -euo pipefail

SPARK_PKG=$(python -c "import pyspark, os; print(os.path.dirname(pyspark.__file__))")
JAVA=${JAVA_HOME:-/usr/lib/jvm/java-17-openjdk-amd64}/bin/java
DIR=/tmp/spark-cluster
MASTER_URL=spark://127.0.0.1:7077

start() {
  local n=${1:-4}
  mkdir -p $DIR/logs
  if ! pgrep -f org.apache.spark.deploy.master.Master > /dev/null; then
    SPARK_HOME=$SPARK_PKG SPARK_SCALA_VERSION=2.13 \
      $JAVA -cp "$SPARK_PKG/jars/*" -Xmx1g org.apache.spark.deploy.master.Master \
      --host 127.0.0.1 --port 7077 --webui-port 8089 > $DIR/logs/master.log 2>&1 &
    echo $! > $DIR/master.pid
    sleep 5
  fi
  rm -f $DIR/worker.pids
  for i in $(seq 1 "$n"); do
    if ! pgrep -f "deploy.worker.Worker.*--port $((7190+i)) " > /dev/null; then
      SPARK_HOME=$SPARK_PKG SPARK_SCALA_VERSION=2.13 SPARK_WORKER_DIR=$DIR/worker$i \
        $JAVA -cp "$SPARK_PKG/jars/*" -Xmx1g org.apache.spark.deploy.worker.Worker \
        --host 127.0.0.1 --port $((7190+i)) --webui-port $((8190+i)) \
        --cores 8 --memory 12g --work-dir $DIR/worker$i $MASTER_URL \
        > $DIR/logs/worker$i.log 2>&1 &
      echo $! >> $DIR/worker.pids
    fi
  done
  sleep 6
  status
}

stop() {
  pkill -f org.apache.spark.deploy.worker.Worker 2>/dev/null || true
  pkill -f org.apache.spark.deploy.master.Master 2>/dev/null || true
  echo "cluster stopped"
}

status() {
  local m w
  m=$(pgrep -fc org.apache.spark.deploy.master.Master || true)
  w=$(pgrep -fc org.apache.spark.deploy.worker.Worker || true)
  echo "master: ${m:-0} worker(s): ${w:-0} url: $MASTER_URL"
}

case "${1:-status}" in
  start) start "${2:-4}" ;;
  stop) stop ;;
  status) status ;;
  *) echo "usage: $0 start [n_workers] | stop | status" >&2; exit 1 ;;
esac
