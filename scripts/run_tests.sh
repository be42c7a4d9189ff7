#!/bin/sh
# Both test tiers, fast first.  Measured on the 2-vCPU host: fast tier
# ~7-8 min; slow tier now includes the reference-scale unordered gates
# (tests/test_unordered_scale.py: ~20 min matching separation at
# 500+1500, ~35 min 500-frame reconstruction) on top of the r3 e2e
# tests — budget ~80+ min for the full slow tier (e2e reconstructions
# run in subprocesses — see tests/test_scale.py for why).
set -e
cd "$(dirname "$0")/.."
echo "=== fast tier (default: pytest.ini deselects 'slow') ==="
python -m pytest tests/ -q
echo "=== slow tier ==="
python -m pytest tests/ -q -m slow
