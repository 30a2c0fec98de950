#!/usr/bin/env bash
# One-command TPU re-measurement after a tunnel outage.
#
# Round 3's FROC proof rerun was CPU-timed (the axon tunnel went down
# mid-round) and its int8 phases were skipped — int8 conv emulation on a
# 1-core host is ~16 min/slide. This script re-measures everything that
# needs the real chip, in dependency order. Each step is independently
# resumable; re-run the script after a failure.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/proofs

probe=$(timeout 120 python -c "import jax; print(len(jax.devices()))" 2>/dev/null | tail -1)
if [ -z "${probe}" ]; then
    echo "TPU still unreachable (jax.devices() timed out)" >&2
    exit 2
fi
echo "== devices: ${probe}"

echo "== headline bench (float + int8)"
python bench.py | tee /tmp/bench_tpu.json

echo "== training-step bench (standard + frozen-BN)"
python scripts/train_bench.py --batch 512 | tee /tmp/train_bench_tpu.json
python scripts/train_bench.py --batch 512 --freeze_bn --skip_simclr | tee /tmp/train_bench_frozen_tpu.json

echo "== NT-Xent XLA-vs-Pallas (through 2N=32768)"
python scripts/ntxent_bench.py --sizes 4096,16384,32768 | tee /tmp/ntxent_bench_tpu.json

echo "== FROC proof: fill the int8 phases (resume keeps recorded phases)"
python scripts/froc_e2e_proof.py --resume

echo "== gigapixel multiscale +- cascade wall (needs the gigapixel fixture)"
if [ -f /tmp/hipac_gigapixel/tumor_giant.tif ]; then
    python scripts/giga_ms_bench.py
else
    echo "   fixture missing; fabricate with scripts/gigapixel_proof.py first"
fi

echo "== done; update docs/PERFORMANCE.md and docs/proofs/ from the outputs above"
