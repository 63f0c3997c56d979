#!/bin/sh
# Full-vector parity on the real TPU -> TPU_VECTORS.md (see
# tools/tpu_vectors.py).  Appends the axon plugin path so the TPU
# backend is visible when run from a source checkout.
set -eu
HERE="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${HERE}:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
exec python "$HERE/tools/tpu_vectors.py"
