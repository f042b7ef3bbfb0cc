#!/usr/bin/env bash
# Full adversarial + execution-nondeterminism audit pipeline (DIRTYDATA.md).
#
# Runs the complete oracle sweep on every adversarial corpus (building any
# that are missing), then the two execution axes:
#   §7 scan-order:      shuffled corpus, hash-diffed vs the clean sweep
#   §8 decomposition:   clean corpus under hostile confs, hash-diffed too
#
# Artifacts land in $OUT (default /tmp/audits_rN). Exit non-zero if any
# sweep fails or any hash drifts. ~45 min end-to-end on local[32].
set -euo pipefail
cd "$(dirname "$0")/.."

SRC="${SRC:-/root/testdata/sf0.001}"
OUT="${OUT:-/tmp/audits_$(date +%Y%m%d)}"
V="$(python -c 'import sys; sys.path.insert(0,"scripts"); from adversarial_data import CORPUS_VERSION; print(CORPUS_VERSION)')"
mkdir -p "$OUT"

corpus() { # mode -> dir (build if missing)
  local mode="$1" dir="/tmp/spark_graft_sf_${1}_${V}"
  [ -f "$dir/region.parquet" ] || python scripts/adversarial_data.py "$mode" "$dir" "$SRC" >/dev/null
  echo "$dir"
}

echo "== clean baseline (value-hashed) =="
python scripts/verify_local.py --json "$OUT/clean.json" "$SRC" | tail -1

for mode in empty dirty skew unicode shuffled; do
  echo "== $mode corpus =="
  python scripts/verify_local.py --json "$OUT/$mode.json" "$(corpus $mode)" | tail -1
done

echo "== §7 scan-order hash diff (clean vs shuffled) =="
python scripts/hash_diff.py "$OUT/clean.json" "$OUT/shuffled.json" | tail -1

echo "== §8 decomposition (perturbed confs on the clean corpus) =="
SPARK_GRAFT_EXTRA_CONF="spark.sql.shuffle.partitions=7;spark.sql.files.maxPartitionBytes=65536;spark.sql.files.openCostInBytes=0;spark.sql.execution.arrow.maxRecordsPerBatch=64" \
  python scripts/verify_local.py --json "$OUT/perturbed.json" "$SRC" | tail -1
python scripts/hash_diff.py "$OUT/clean.json" "$OUT/perturbed.json" | tail -1

echo "== §8 plan-strategy (AQE off, auto-broadcast off) =="
SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.enabled=false;spark.sql.autoBroadcastJoinThreshold=-1;spark.sql.shuffle.partitions=64" \
  python scripts/verify_local.py --json "$OUT/planB.json" "$SRC" | tail -1
python scripts/hash_diff.py "$OUT/clean.json" "$OUT/planB.json" | tail -1

echo "== §8c evaluation path (codegen off, vectorized readers off) =="
SPARK_GRAFT_EXTRA_CONF="spark.sql.codegen.wholeStage=false;spark.sql.codegen.factoryMode=NO_CODEGEN;spark.sql.parquet.enableVectorizedReader=false;spark.sql.orc.enableVectorizedReader=false" \
  python scripts/verify_local.py --json "$OUT/evalpath.json" "$SRC" | tail -1
python scripts/hash_diff.py "$OUT/clean.json" "$OUT/evalpath.json" | tail -1

echo "== §9 environment (hostile JVM timezone + Turkish locale) =="
TZ=Asia/Kathmandu JAVA_TOOL_OPTIONS="-Duser.language=tr -Duser.country=TR -Duser.timezone=Asia/Kathmandu" \
  python scripts/verify_local.py --json "$OUT/env.json" "$SRC" | tail -1
python scripts/hash_diff.py "$OUT/clean.json" "$OUT/env.json" | tail -1

echo "== §9b arrow/pandas seam profile (r9 ask #5: tiny Arrow batches, strict conversion, pandas copy-on-write) =="
# PANDAS_COPY_ON_WRITE needs a fresh JVM: Python workers inherit the JVM's
# env, frozen at JVM start — which this subprocess provides.  The conf pin
# rides SPARK_GRAFT_EXTRA_CONF so seam builders' own conf.set yields to it
# (session.set_unless_pinned — the r9 ADVICE fix this sweep exercises).
PANDAS_COPY_ON_WRITE=1 \
SPARK_GRAFT_EXTRA_CONF="spark.sql.execution.arrow.maxRecordsPerBatch=16;spark.sql.execution.pandas.convertToArrowArraySafely=true" \
  python scripts/verify_local.py --json "$OUT/seam.json" "$SRC" | tail -1
python scripts/hash_diff.py "$OUT/clean.json" "$OUT/seam.json" | tail -1

echo "all audits green; artifacts in $OUT"
