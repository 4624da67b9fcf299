#!/usr/bin/env bash
# One-command round gate (VERDICT r4 item 8): every step must pass before
# a round snapshot is taken, so BENCH_r{N}/MULTICHIP_r{N} can never record
# a state the gate didn't pass.
#
#   bash scripts/check.sh          # full gate (CPU suite + TPU lanes)
#   bash scripts/check.sh --fast   # fast feedback: CPU suite only, no TPU
#
# Steps:
#   1. fast pytest subset  (interface + bijectors + objectives; ~1 min)
#   2. full CPU suite      (default marks; then archive + slow marks)
#   3. tpu_check.py        (compiled-on-chip assertions, real TPU)
#   4. bench.py            (scoreboard JSON; rc!=0 or null value fails)
#   5. __graft_entry__     (driver entry + 8-virtual-device mesh dryrun)
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_tpu}"

step() { echo; echo "=== check: $1 ==="; }

step "fast pytest subset"
python -m pytest tests/test_interface.py tests/test_bijectors.py \
    tests/test_objectives.py -q -x

step "full CPU suite (default marks)"
python -m pytest tests/ -q

step "archive + slow marks"
python -m pytest tests/ -q -m "archive or slow"

if [[ "${1:-}" == "--fast" ]]; then
    echo; echo "check: FAST MODE — TPU lanes skipped"; exit 0
fi

step "TPU compiled assertions (benchmarks/tpu_check.py)"
PYTHONPATH=".:${PYTHONPATH:-}" python benchmarks/tpu_check.py

step "driver entry points (single-chip jit + 1-dev dryrun)"
python __graft_entry__.py

step "8-virtual-device sharded train step"
python -c "import jax; jax.config.update('jax_platforms','cpu'); \
  jax.config.update('jax_num_cpu_devices', 8); \
  import __graft_entry__ as g; g.dryrun_multichip(8)"

step "bench.py scoreboard"
out=$(python bench.py)
echo "$out"
python - "$out" << 'EOF'
import json, sys
row = json.loads(sys.argv[1])
assert row.get("value") is not None, "bench headline is null"
assert row.get("error") is None, f"bench errored: {row.get('error')}"
print("bench OK:", row["value"], row["unit"])
EOF

echo; echo "=== check: ALL GREEN ==="
