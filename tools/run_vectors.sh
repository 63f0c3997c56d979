#!/bin/sh
# Vector runner: pipe every reference .lz4 through the real CLI binary,
# sha256-compare against the .bin ground truth, print per-vector MiB/s.
# Analog of the reference's test_run.sh (sha256 compare + time -p); the
# reference needed `ulimit -s 60000` for its stack-allocated buffers —
# not applicable here.
#
# Usage: tools/run_vectors.sh [vector_dir]
set -u
DIR="${1:-/root/reference/test_vectors_lz4}"
HERE="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${HERE}${PYTHONPATH:+:$PYTHONPATH}"

fail=0
for f in "$DIR"/*.lz4; do
    name="$(basename "$f" .lz4)"
    bin="$DIR/$name.bin"
    t0=$(date +%s.%N)
    sum_got="$(python -m lz4tpu.cli unlz4 < "$f" | sha256sum | cut -d' ' -f1)" || {
        echo "[FAIL] $name: decoder error"; fail=1; continue; }
    t1=$(date +%s.%N)
    if [ -f "$bin" ]; then
        sum_want="$(sha256sum < "$bin" | cut -d' ' -f1)"
    elif [ "$name" = "z9m" ]; then
        # z9m.bin is absent upstream (.MISSING_LARGE_BLOBS): the ground
        # truth is 9437166 zero bytes.
        sum_want="$(head -c 9437166 /dev/zero | sha256sum | cut -d' ' -f1)"
    else
        echo "[SKIP] $name: no ground truth"; continue
    fi
    if [ "$sum_got" = "$sum_want" ]; then
        if [ -f "$bin" ]; then size=$(stat -c%s "$bin"); else size=9437166; fi
        mibs=$(echo "$size $t0 $t1" | awk '{ dt=$3-$2; if (dt<=0) dt=1e-9;
                                             printf "%.1f", $1/dt/1048576 }')
        echo "[ OK ] $name (${mibs} MiB/s decoded, incl. interpreter startup)"
    else
        echo "[FAIL] $name: sha256 mismatch"; fail=1
    fi
done
exit $fail
