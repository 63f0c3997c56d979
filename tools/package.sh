#!/bin/sh
# Packaging analog of the reference's Debian metadata + install map
# (reference: build.xml:5-9,52-60 builds a .deb with library + tools).
# Builds a wheel + sdist with setuptools' PEP 517 backend directly (no
# pip/build needed); the native engine ships as SOURCE inside the
# wheel (lz4tpu/native/lz4core.cpp) and self-compiles with g++ on
# first import, so the artifact is platform-independent.
#
# Usage: tools/package.sh [outdir]   (default: dist/)
set -eu
HERE="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$HERE/dist}"
mkdir -p "$OUT"
cd "$HERE"
python - "$OUT" <<'PY'
import sys
from setuptools import build_meta

out = sys.argv[1]
sdist = build_meta.build_sdist(out)
wheel = build_meta.build_wheel(out)
print(f"built {out}/{sdist} and {out}/{wheel}")
PY
# setuptools scratch (gitignored, but keep the checkout tidy)
rm -rf "$HERE/build" "$HERE"/*.egg-info
