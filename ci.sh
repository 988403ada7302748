#!/usr/bin/env bash
# CI gate: full test suite on CPU (virtual 8-device mesh) + a bench smoke.
# Usage: ./ci.sh [--fast]   (--fast runs the quick test subset only)
set -euo pipefail
cd "$(dirname "$0")"

if [[ "${1:-}" == "--fast" ]]; then
  python -m pytest tests/test_math.py tests/test_models.py \
    tests/test_plasticity_properties.py tests/test_damage.py \
    tests/test_oracles.py tests/test_penalty_and_zup.py -q
elif [[ "${1:-}" == "--nightly" ]]; then
  python -m pytest tests/ -q
else
  # Default: everything except the heaviest multi-device equivalence runs
  # (marked nightly; ~20+ min each on the 1-core CI box).
  python -m pytest tests/ -q -m "not nightly"
fi

# Bench smoke: tiny sand3 on whatever backend is available (CPU ok) — checks
# that bench.py still emits its one-line JSON contract.
BENCH_OUT=$(mktemp)
SPARKL_BENCH_PLATFORM=cpu SPARKL_BENCH_SCALE=16 SPARKL_BENCH_FRAMES=1 \
  python bench.py > "$BENCH_OUT"
python - "$BENCH_OUT" <<'EOF'
import json, sys
line = open(sys.argv[1]).read().strip()
d = json.loads(line)
assert {"metric", "value", "unit", "vs_baseline"} <= set(d), d
assert d["value"] > 0, d
print("bench smoke ok:", line)
EOF
rm -f "$BENCH_OUT"

# Driver entry contract on the virtual 8-device CPU mesh.
XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.block_until_ready(jax.jit(fn)(*args).position)
g.dryrun_multichip(8)
print("graft entry + dryrun_multichip(8) ok")
EOF

echo "CI green"
