#!/bin/bash
# Round bench campaign: N full sweeps per scale on the final jar, each
# sweep's per-query JSON saved for the element-wise best merge.
set -u
OUT=${1:-/tmp/campaign_r15}
N01=${2:-5}
N1=${3:-3}
mkdir -p "$OUT"
cd /root/repo
for i in $(seq 1 "$N01"); do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  cp target/bench_last.json "$OUT/sf01_$i.json"
  echo "sf0.1 sweep $i: $(python3 -c "import json;print(json.load(open('$OUT/sf01_$i.json'))['value'])")"
done
for i in $(seq 1 "$N1"); do
  SPARK_GRAFT_SF_DIR=target/sf1 sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  cp target/bench_last.json "$OUT/sf1_$i.json"
  echo "sf1 sweep $i: $(python3 -c "import json;print(json.load(open('$OUT/sf1_$i.json'))['value'])")"
done
echo campaign-done
