"""Benchmark: LZ4 decode throughput per chip on the reference's large
vectors (z9m.lz4 + t1111k.lz4), per driver BASELINE.json.

Methodology
-----------
Measures steady-state full decodes through the device pipeline's
best engine per chain (Pallas segment-copy kernel; see
lz4tpu/device/pallas_decode.py), with decompressed output left
device-resident — the production deployment of a TPU-native codec is
decoded bytes feeding TPU consumers in HBM. Each timed iteration does
all decode work fresh:

  host:   frame parse + native token scan -> sequence tables
  device: chain decode kernels (dispatched per chain)
  sync:   scalar probe fetched from every chain's output
          (block_until_ready does not sync on this platform)

Checksum verification and bit-exactness against the host engine are
asserted once outside the timed region.

vs_baseline: the reference Ada library decodes zeros at 2094 MiB/s and
text at 1099 MiB/s (single Xeon core, hyperfine mode — BASELINE.md).
Weighted over these two vectors:

  t_ref = 9437166 B / 2094 MiB/s + 1137664 B / 1099 MiB/s = 5.29 ms
  ref_aggregate = 10574830 B / t_ref = 2.00 GB/s

so vs_baseline = value / 2.00.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

VECTOR_DIR = pathlib.Path(
    os.environ.get("LZ4TPU_VECTORS", "/root/reference/test_vectors_lz4")
)
VECTORS = ["z9m", "t1111k"]
REF_AGGREGATE_GBPS = 2.00  # see module docstring
REPS = int(os.environ.get("LZ4TPU_BENCH_REPS", "5"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from lz4tpu import FOR_ALL, decompress_host
    from lz4tpu.device import pallas_decode as pk
    from lz4tpu.frame import parse_frames
    from lz4tpu.pipeline import _chains_of, build_seq_table

    staged = []
    total_bytes = 0
    for name in VECTORS:
        data = (VECTOR_DIR / f"{name}.lz4").read_bytes()
        buf = np.frombuffer(data, dtype=np.uint8)
        staged.append((name, data, buf))
        parsed = parse_frames(buf, FOR_ALL)
        table = build_seq_table(buf, parsed, FOR_ALL, data)
        total_bytes += table.n_out

    def decode_iteration():
        """Full decode of both vectors; returns device output handles."""
        handles = []
        for name, data, buf in staged:
            parsed = parse_frames(buf, FOR_ALL)
            table = build_seq_table(buf, parsed, FOR_ALL, data)
            for chain in _chains_of(table):
                n_loc = chain.out_hi - chain.out_lo
                if n_loc == 0:
                    continue
                fr = parsed.frames[chain.frame_id]
                sl = slice(chain.seq_lo, chain.seq_hi)
                out = pk.decode_chain_device(
                    buf[fr.start:fr.end],
                    (table.out_start[sl] - chain.out_lo).astype(np.int32),
                    (table.lit_src[sl] - fr.start).astype(np.int32),
                    table.lit_len[sl],
                    table.match_off[sl],
                    table.match_len[sl],
                    n_loc,
                )
                handles.append((name, chain, out, n_loc))
        return handles

    def sync(handles):
        probe = sum(jnp.sum(h[2][:1, :1]) for h in handles)
        jax.device_get(probe)

    # Correctness gate (outside timing): device output == host engine.
    expected = {name: decompress_host(data) for name, data, _ in staged}
    got = {name: bytearray(len(expected[name])) for name, _, _ in staged}
    for name, chain, out, n_loc in decode_iteration():
        flat = np.asarray(jax.device_get(out)).view(np.uint8).reshape(-1)
        got[name][chain.out_lo:chain.out_hi] = flat[
            pk.PAD_BYTES:pk.PAD_BYTES + n_loc
        ].tobytes()
    for name in got:
        assert bytes(got[name]) == expected[name], f"{name}: device mismatch"

    # Warm-up (compile), then timed steady state.
    sync(decode_iteration())
    t0 = time.time()
    last = None
    for _ in range(REPS):
        last = decode_iteration()
    sync(last)
    elapsed = (time.time() - t0) / REPS

    gbps = total_bytes / elapsed / 1e9
    print(
        json.dumps(
            {
                "metric": "lz4_decode_throughput_z9m_t1111k",
                "value": round(gbps, 4),
                "unit": "GB/s/chip",
                "vs_baseline": round(gbps / REF_AGGREGATE_GBPS, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
