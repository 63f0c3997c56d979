#!/bin/sh
# Synthetic-corpus benchmark: zeroes / random / base64-text, the same
# three corpus classes as the reference's test_benchmark.sh (which uses
# 2 GiB corpora, dd/pv/hyperfine, and Debian's unlz4 as the yardstick).
# Corpus size is configurable because CI machines are smaller.
#
# Comparison arm (reference: test_benchmark.sh:36-48 times unlz4ada
# against Debian unlz4): if a system lz4/unlz4 exists it is timed on
# the same corpora; otherwise the reference's RECORDED rates
# (README.md:806-813, Xeon W-2295 VM) are used for the ratio column.
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

# competing decoder, if present (Debian lz4 provides unlz4/lz4cat)
COMPETITOR=""
for c in unlz4 lz4cat lz4; do
    if command -v "$c" >/dev/null 2>&1; then COMPETITOR="$c"; break; fi
done

# reference recorded hyperfine averages, MiB/s (README.md:806-813)
ref_ada() { case "$1" in zeroes) echo 2094;; random) echo 1109;; text) echo 1099;; esac; }
ref_unlz4() { case "$1" in zeroes) echo 2770;; random) echo 3155;; text) echo 3177;; esac; }

printf '\n| corpus | ours MiB/s | Ada ref MiB/s | ours/Ada | C unlz4 MiB/s | ours/C |\n'
printf '|---|---:|---:|---:|---:|---:|\n'
for kind in zeroes random text; do
    python -m lz4tpu.cli lz4-compress < "$TMP/$kind" > "$TMP/$kind.lz4"
    OUT="$(python -m lz4tpu.cli lz4-bench --backend "$BACKEND" --reps 3 \
        "$TMP/$kind.lz4" 2>&1 | sed "s/^/[$kind] /" | tee /dev/stderr)"
    OURS="$(printf '%s\n' "$OUT" | sed -n 's/.*TOTAL: \([0-9.]*\) MB\/s.*/\1/p')"
    OURS_MIB="$(awk "BEGIN{printf \"%.0f\", $OURS * 1000000 / 1048576}")"
    if [ -n "$COMPETITOR" ]; then
        T0=$(date +%s.%N)
        case "$COMPETITOR" in
            lz4) lz4 -d -c "$TMP/$kind.lz4" > /dev/null ;;
            *) "$COMPETITOR" < "$TMP/$kind.lz4" > /dev/null ;;
        esac
        T1=$(date +%s.%N)
        CREF="$(awk "BEGIN{printf \"%.0f\", $MIB / ($T1 - $T0)}")"
        CSRC="$COMPETITOR (measured)"
    else
        CREF="$(ref_unlz4 "$kind")"
        CSRC="recorded"
    fi
    ADA="$(ref_ada "$kind")"
    printf '| %s | %s | %s (recorded) | %s | %s (%s) | %s |\n' \
        "$kind" "$OURS_MIB" "$ADA" \
        "$(awk "BEGIN{printf \"%.2f\", $OURS_MIB / $ADA}")" \
        "$CREF" "$CSRC" \
        "$(awk "BEGIN{printf \"%.2f\", $OURS_MIB / $CREF}")"
done
