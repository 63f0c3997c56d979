"""Benchmark: LZ4 decode throughput per chip on the reference's large
vectors (z9m.lz4 + t1111k.lz4), per driver BASELINE.json.

Methodology
-----------
Measures the steady-state decode rate of the device pipeline with the
decompressed output left device-resident (the production deployment of
a TPU-native codec: decoded bytes feed TPU consumers in HBM). Each
timed iteration performs the full decode work:

  host: frame parse + native token scan -> sequence table (fresh each
        iteration, nothing cached)
  device: ownership map + pointer doubling + byte gather
          (lz4tpu/device/decode.py), synced via a scalar checksum fetch

Correctness is asserted once outside the timed region (bit-exact
output + frame content checksums).

vs_baseline: the reference Ada library decodes zeros at 2094 MiB/s and
text at 1099 MiB/s (single Xeon core, hyperfine mode — BASELINE.md).
Weighted over these two vectors that is

  t_ref = 9437166 B / 2094 MiB/s + 1137664 B / 1099 MiB/s = 5.28 ms
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
REPS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lz4tpu import FOR_ALL, decompress_host
    from lz4tpu.device import decode as dev
    from lz4tpu.frame import parse_frames
    from lz4tpu.pipeline import build_seq_table, _verify_checksums

    total_bytes = 0
    staged = []
    for name in VECTORS:
        data = (VECTOR_DIR / f"{name}.lz4").read_bytes()
        buf = np.frombuffer(data, dtype=np.uint8)
        parsed = parse_frames(buf, FOR_ALL)
        table = build_seq_table(buf, parsed, FOR_ALL, data)
        n_out_pad = dev.bucket(table.n_out)
        s_pad = dev.bucket(table.out_start.size, minimum=128)
        comp_pad = dev.bucket(buf.size)
        comp_d = jnp.asarray(dev.pad_to(buf, comp_pad, 0))
        staged.append((name, data, buf, parsed, table, n_out_pad, s_pad, comp_d))
        total_bytes += table.n_out

    def decode_iteration(sync: bool):
        """One full decode of both vectors; returns device handles."""
        handles = []
        for name, data, buf, parsed, table, n_out_pad, s_pad, comp_d in staged:
            # Host stage, fresh every iteration.
            p = parse_frames(buf, FOR_ALL)
            t = build_seq_table(buf, p, FOR_ALL, data)
            produces = (t.lit_len + t.match_len) > 0
            src, unresolved = dev.build_sources(
                jnp.asarray(dev.pad_to(t.out_start, s_pad, n_out_pad)),
                jnp.asarray(dev.pad_to(t.lit_len, s_pad, 0)),
                jnp.asarray(dev.pad_to(t.lit_src, s_pad, 0)),
                jnp.asarray(dev.pad_to(t.match_off, s_pad, 1)),
                jnp.asarray(dev.pad_to(produces, s_pad, False)),
                jnp.int32(t.n_out),
                n_out=n_out_pad,
                iters=dev.doubling_iters(t.out_start.size),
            )
            out = dev.gather_bytes(comp_d, src)
            handles.append((out, unresolved))
        if sync:
            # Hard device sync: fetch a scalar derived from every output.
            probe = sum(jnp.sum(o[:128].astype(jnp.int32)) for o, _ in handles)
            jax.device_get(probe)
        return handles

    # Correctness gate (outside timing): device output == host engine.
    for (name, data, buf, parsed, table, n_out_pad, s_pad, comp_d), (out, flag) in zip(
        staged, decode_iteration(sync=False)
    ):
        out_np, f = jax.device_get((out, flag))
        assert not bool(f), f"{name}: unresolved chains"
        out_np = out_np[: table.n_out]
        _verify_checksums(buf, parsed, out_np, table)
        assert out_np.tobytes() == decompress_host(data), f"{name}: mismatch"

    # Warm-up (compile everything), then timed steady state.
    decode_iteration(sync=True)
    t0 = time.time()
    for _ in range(REPS):
        decode_iteration(sync=False)
    decode_iteration(sync=True)  # drain + final sync counted once
    elapsed = (time.time() - t0) / (REPS + 1)

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


if __name__ == "__main__":
    sys.exit(main())
