#!/usr/bin/env bash
# Sanitizer run for the first-party threaded C++ (io/native): builds the
# TSan and ASan variants of libhipac_native.so and runs the native test
# suite (including the >=8-worker repeat-stress tests) against each.
#
# The Python interpreter itself is not sanitizer-built, so the sanitizer
# runtime must be preloaded before libpython loads the instrumented .so;
# ASan additionally needs verify_asan_link_order=0 for the same reason.
#
# Usage: scripts/sanitize_native.sh [pytest args...]
# Writes a JSON summary to docs/proofs/sanitizer_report.json.
set -u
cd "$(dirname "$0")/.."
NATIVE=ss25_hierarchical_multiscale_image_classification_tpu/io/native
OUT=docs/proofs/sanitizer_report.json
# Default scope: the native decoder/chunkproc tests, including the
# >=8-worker concurrency stress. The two jax-driven integration tests are
# excluded — XLA's own thread pools under TSan instrumentation take tens
# of minutes per compile and are not the first-party C++ under test.
PYTEST_ARGS=${@:-"tests/test_native.py -q --deselect tests/test_native.py::test_tiff_extraction_pipeline --deselect tests/test_native.py::test_sliding_window_on_tiff"}

make -C "$NATIVE" tsan asan || exit 1

run_one() {
  local name=$1 lib=$2 preload=$3 extra_env=$4
  local log=/tmp/sanitize_${name}.log
  echo "=== $name ==="
  env LD_PRELOAD="$preload" HIPAC_NATIVE_LIB="$PWD/$NATIVE/$lib" \
      JAX_PLATFORMS=cpu $extra_env \
      python -m pytest $PYTEST_ARGS >"$log" 2>&1
  local rc=$?
  tail -3 "$log"
  # sanitizer findings fail the process and/or print WARNING/ERROR blocks
  local findings
  findings=$(grep -c -E "WARNING: ThreadSanitizer|ERROR: AddressSanitizer|SUMMARY: (Thread|Address)Sanitizer" "$log")
  echo "$name: rc=$rc findings=$findings"
  RESULTS="$RESULTS \"$name\": {\"pytest_rc\": $rc, \"sanitizer_findings\": $findings},"
  [ $rc -eq 0 ] && [ "$findings" -eq 0 ]
}

TSAN_RT=$(g++ -print-file-name=libtsan.so)
ASAN_RT=$(g++ -print-file-name=libasan.so)
RESULTS=""
ok=0
run_one tsan libhipac_native_tsan.so "$TSAN_RT" \
  "TSAN_OPTIONS=halt_on_error=0" || ok=1
run_one asan libhipac_native_asan.so "$ASAN_RT" \
  "ASAN_OPTIONS=verify_asan_link_order=0:detect_leaks=0" || ok=1

mkdir -p "$(dirname "$OUT")"
cat > "$OUT" <<EOF
{
  "metric": "native_decoder_sanitizers",
  "pytest_args": "$PYTEST_ARGS",
  ${RESULTS%,},
  "clean": $([ $ok -eq 0 ] && echo true || echo false)
}
EOF
cat "$OUT"
exit $ok
