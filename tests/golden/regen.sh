#!/bin/bash
# Regenerate golden parity fixtures from the reference implementation.
# The reference sources stay read-only at /root/reference; only the emitted
# JSON fixtures are committed.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -std=c++11 -I/root/reference -o /tmp/gen_golden gen_golden.cpp
(cd "$(pwd)" && /tmp/gen_golden)
echo "done"
