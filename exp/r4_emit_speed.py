"""Round-4 on-chip emit-inputs throughput: ONE-sort scheme vs the
8-sort ladder, interleaved, two-point slopes, medians, one process.
Criterion (round-3 verdict next-#6): >= 150 MB/s payload.

Harness notes (two failed attempts recorded so they are not retried):
* a chained fori_loop with a `c ^ (elen * 0)` carry gets constant-
  folded and the pass DCE'd/hoisted — the ladder "ran" 8 4M-element
  multi-key sorts in 2.9 ms, impossible;
* a chained fori_loop with an honest carry compiles for >9 minutes
  (the loop body inlines the whole 9-key sort program) — never
  finished within the harness deadline.
So: plain QUEUED dispatches of the already-jitted pass.  Each pass is
40-85 ms of device time, three orders above the ~2 ms tunnel dispatch
overhead, and the two-point slope cancels fixed per-dispatch cost
anyway (it is linear in reps).  Alternating two staged buffers (differ
in one PAD byte) keeps runs from being trivially identical.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/r4_emit_speed.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu.device import encode

V = "/root/reference/test_vectors_lz4"
# text-like payload, multi-MiB: tile the two text vectors to 4 MiB
t3 = open(f"{V}/t300k.bin", "rb").read()
t1 = open(f"{V}/t1111k.bin", "rb").read()
import os
MB = int(os.environ.get("LZ4TPU_EMIT_MB", "4"))
payload = (t3 + t1) * (MB * 1024 * 1024 // len(t3 + t1) + 1)
N = MB * 1024 * 1024
data = np.frombuffer(payload[:N], np.uint8).copy()
n_pad = N
n_real = np.int32(N - 16)    # keep the toggle byte out of real range

data[-1] = 0
buf_a = jnp.asarray(data)
data[-1] = 1
buf_b = jnp.asarray(data)
BUFS = (buf_a, buf_b)


def sync(pair):
    return int(jax.device_get(pair[0][0]))


def timed(inner, reps):
    t0 = time.time()
    out = None
    for k in range(reps):
        out = inner(BUFS[k & 1], n_real, n_pad=n_pad)
    sync(out)
    return time.time() - t0


VARIANTS = (("one-sort", encode._emit_inputs_device),
            ("ladder", encode._emit_inputs_device_ladder))

for name, inner in VARIANTS:          # compile + warm
    t = timed(inner, 1)
    print(f"{name}: compile+first {t:.1f}s", flush=True)
    timed(inner, 2)

res = {name: [] for name, _ in VARIANTS}
for _round in range(5):
    for name, inner in VARIANTS:
        t_small = timed(inner, 2)
        t_big = timed(inner, 6)
        res[name].append((t_big - t_small) / 4)

print(f"\npayload {N / 1e6:.1f} MB   (emit-inputs device pass only)")
for name in res:
    s = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:9s}  {s * 1e3:8.2f} ms/pass   "
          f"{N / s / 1e6:7.1f} MB/s payload")
