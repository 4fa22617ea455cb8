#!/bin/bash
# Round bench campaign: N full sweeps per scale on the final jar, each
# sweep's per-query JSON saved for the element-wise best merge.
#
# A sweep only counts if (a) sbt exited 0 AND (b) target/bench_last.json
# was rewritten by THIS sweep (mtime check) — a failed run must never
# silently duplicate the previous sweep's numbers into the merge
# (the r15 campaign's swallowed-failure hazard).
set -u
OUT=${1:-/tmp/campaign_r16}
N01=${2:-5}
N1=${3:-3}
mkdir -p "$OUT"
cd /root/repo

run_sweep() { # $1=sf-dir $2=output-file $3=label
  local before after
  before=$(stat -c %Y target/bench_last.json 2>/dev/null || echo 0)
  if ! SPARK_GRAFT_SF_DIR="$1" sbt -batch "runMain graft.Bench" \
      > "$OUT/$3.log" 2>&1; then
    echo "$3: FAILED (sbt exit != 0, log: $OUT/$3.log)" >&2
    return 1
  fi
  after=$(stat -c %Y target/bench_last.json 2>/dev/null || echo 0)
  if [ "$after" -le "$before" ]; then
    echo "$3: FAILED (bench_last.json not rewritten, log: $OUT/$3.log)" >&2
    return 1
  fi
  cp target/bench_last.json "$2"
  echo "$3: $(python3 -c "import json;print(json.load(open('$2'))['value'])")"
}

fails=0
for i in $(seq 1 "$N01"); do
  run_sweep /root/testdata/sf0.1 "$OUT/sf01_$i.json" "sf0.1 sweep $i" || fails=$((fails+1))
done
for i in $(seq 1 "$N1"); do
  run_sweep target/sf1 "$OUT/sf1_$i.json" "sf1 sweep $i" || fails=$((fails+1))
done
if [ "$fails" -gt 0 ]; then
  echo "campaign-done WITH $fails FAILED SWEEP(S)" >&2
  exit 1
fi
echo campaign-done
