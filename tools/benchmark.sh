#!/bin/sh
# Synthetic-corpus benchmark: zeroes / random / base64-text, the same
# three corpus classes as the reference's test_benchmark.sh (which uses
# 2 GiB corpora, dd/pv/hyperfine, and Debian's unlz4 as the yardstick).
# Corpus size is configurable because CI machines are smaller.
#
# Usage: tools/benchmark.sh [size_mib] [backend]
set -eu
MIB="${1:-64}"
BACKEND="${2:-host}"
HERE="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${HERE}${PYTHONPATH:+:$PYTHONPATH}"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT

echo "corpus ${MIB} MiB, backend=${BACKEND}"
head -c $((MIB * 1048576)) /dev/zero > "$TMP/zeroes"
head -c $((MIB * 1048576)) /dev/urandom > "$TMP/random"
head -c $((MIB * 786432)) /dev/urandom | base64 -w0 | head -c $((MIB * 1048576)) > "$TMP/text"

for kind in zeroes random text; do
    python -m lz4tpu.cli lz4-compress < "$TMP/$kind" > "$TMP/$kind.lz4"
    python -m lz4tpu.cli lz4-bench --backend "$BACKEND" --reps 3 "$TMP/$kind.lz4" \
        | sed "s/^/[$kind] /"
done
