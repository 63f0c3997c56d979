#!/bin/sh
# Coverage harness: analog of the reference's `ant cov` target
# (test_suite/build.xml:16-50, gcov/lcov/genhtml).  Uses coverage.py if
# available, else falls back to a plain test run.
set -eu
HERE="$(cd "$(dirname "$0")/.." && pwd)"
cd "$HERE"
if python -c "import coverage" 2>/dev/null; then
    python -m coverage run --source=lz4tpu -m pytest tests/ -q
    python -m coverage report -m
    python -m coverage html -d cov 2>/dev/null && echo "HTML report: cov/"
else
    echo "coverage.py not installed; using the stdlib sys.monitoring" >&2
    echo "harness (tools/pycov.py) -> COVERAGE.md" >&2
    python tools/pycov.py tests/ -q
fi
