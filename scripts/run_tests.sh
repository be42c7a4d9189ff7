#!/bin/sh
# Both test tiers, fast first.  Measured on the 2-vCPU host (r3 judge):
# fast tier ~8 min, slow tier ~15+ min (e2e reconstructions in
# subprocesses — see tests/test_scale.py for why).
set -e
cd "$(dirname "$0")/.."
echo "=== fast tier (default: pytest.ini deselects 'slow') ==="
python -m pytest tests/ -q
echo "=== slow tier ==="
python -m pytest tests/ -q -m slow
