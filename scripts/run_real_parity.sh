#!/usr/bin/env bash
# Retry the network-gated parity north stars (BASELINE.md): published
# MahmoodLab/madeleine weight parity + BCNB linear probing. Appends a dated
# outcome line to BASELINE.md either way. Usage:
#   scripts/run_real_parity.sh [--bcnb_dir /path/to/BCNB]
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/run_real_parity.py "$@"
