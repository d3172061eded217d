#!/bin/bash
# Test runner (reference: /root/reference/test.sh). Tests run hermetically on
# CPU with 8 virtual devices (tests/conftest.py).
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
