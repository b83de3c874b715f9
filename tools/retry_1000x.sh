#!/bin/bash
# Manual standalone retry pass for the r13 1000x probe (see
# SWEEP_r13_1000x.log): one fresh JVM per exception-FAIL name, the
# chunk_sweep heal policy applied by hand because the in-sweep retry
# was cut with the probe. Appends RETRY-prefixed verdicts to the log.
LOG=SWEEP_r13_1000x.log
for n in doc_span_dedup dedup_minhash_lsh dedup_ngram_jaccard \
         doc_winnow_fingerprints dedup_levenshtein_verify \
         dedup_simhash_pairs doc_decontaminate denormalized_order_lines; do
  echo "\$ timeout \$RETRY_TIMEOUT python tools/check_correctness.py spark-warehouse/scale/sf100.0 $n --digest  # RETRY standalone" >> "$LOG"
  out=$(SWEEP_DUCKDB_MEM=48GB timeout "${RETRY_TIMEOUT:-480}" \
        python tools/check_correctness.py \
        spark-warehouse/scale/sf100.0 "$n" --digest 2>/dev/null)
  rc=$?
  echo "$out" | grep -E "^(PASS|FAIL|rows)" | sed "s/^/RETRY /" >> "$LOG"
  if [ $rc -ge 124 ]; then
    echo "RETRY TIMEOUT $n: exceeded ${RETRY_TIMEOUT:-480} s standalone" >> "$LOG"
  fi
done
echo "# manual retry pass complete" >> "$LOG"
