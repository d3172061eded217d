#!/bin/bash
# Test runner (reference: /root/reference/test.sh). Tests run hermetically on
# CPU with 8 virtual devices (tests/conftest.py).
#
# Default: fast tier (<~3 min). Full suite (heavy virtual-mesh parity tests
# included): ./test.sh --full   or   python -m pytest tests/ -q
set -e
cd "$(dirname "$0")"
if [ "$1" = "--full" ]; then
    shift
    python -m pytest tests/ -q "$@"
else
    python -m pytest tests/ -q -m "not slow" "$@"
fi
