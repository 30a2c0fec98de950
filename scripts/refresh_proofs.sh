#!/usr/bin/env bash
# Standard round-proof refresh: re-measures every shipped proof artifact in
# docs/proofs/ on the real chip, in dependency order, resumable.
#
# The HARD texture fixture (froc_hard_proof.py) is the PRIMARY detection
# regression — the 48-slide set saturates at FROC 1.0 for every producer
# (it no longer discriminates anything); the texture fixture separates the
# hierarchy (multiscale crop) from the single-level floor by construction.
# The 48-slide e2e proof remains the end-to-end CLI/FROC integration check.
#
# Usage: scripts/refresh_proofs.sh [quick|full]
#   quick (default): hard-fixture FROC + NT-Xent + train-step + int8
#                    roofline (~45 min, fixtures fabricated on demand)
#   full:            + 48-slide e2e proof + gigapixel extraction +
#                    gigapixel multiscale/cascade wall (hours; fabricates
#                    the 97792x221184 slide if missing)
set -euo pipefail
cd "$(dirname "$0")/.."
MODE=${1:-quick}

echo "=== [1/6] hard texture fixture FROC (PRIMARY detection regression) ==="
python scripts/froc_hard_proof.py --resume

echo "=== [2/6] NT-Xent XLA vs Pallas (value+grad) ==="
python scripts/ntxent_bench.py --sizes 4096,16384,32768

echo "=== [3/6] train-step throughput + segment floors ==="
python scripts/train_bench.py --segments > /tmp/train_bench.json
python - << 'EOF'
import json
d = json.load(open("/tmp/train_bench.json"))
print(json.dumps(d, indent=2))
EOF

echo "=== [4/6] int8 + bf16 per-stage rooflines ==="
python scripts/int8_roofline.py
python scripts/bf16_roofline.py

echo "=== [4b] host decode rates + N-core feed projection ==="
python scripts/decode_bench.py

echo "=== [4c] end-to-end training throughput (store -> train loop) ==="
python scripts/train_bench.py --e2e 25000 > /tmp/train_e2e.json
cat /tmp/train_e2e.json

echo "=== [4d] three-strategy quality shootout (label-scarce split) ==="
python scripts/strategy_shootout.py --resume

if [ "$MODE" = "full" ]; then
  echo "=== [5/6] 48-slide end-to-end FROC proof ==="
  python scripts/froc_e2e_proof.py --resume

  echo "=== [6/6] gigapixel extraction + multiscale/cascade wall ==="
  if [ ! -f /tmp/hipac_gigapixel/tumor_giant.tif ]; then
    python scripts/gigapixel_proof.py
  fi
  python scripts/giga_ms_bench.py
else
  echo "(quick mode: skipping 48-slide e2e + gigapixel phases — run"
  echo " 'scripts/refresh_proofs.sh full' for the complete refresh)"
fi

echo "=== proof refresh complete; artifacts in docs/proofs/ ==="
