"""Round-4 on-chip emit-inputs throughput: ONE-sort scheme vs the
8-sort ladder, interleaved per the CLAUDE.md measurement rules
(chained dispatches inside one jit, two-point slopes, medians, one
process).  Criterion (round-3 verdict next-#6): >= 150 MB/s payload.

Harness note: the loop body must depend on the loop index in a way
XLA cannot fold or hoist — writing (k & 1) into the LAST PAD BYTE
changes the sorted content per iteration without touching real data
(n_real masks it), and carrying acc += elen[0] + eoff[0] keeps the
whole pass live.  A `c ^ (elen * 0)` dependency gets constant-folded
and the pass DCE'd/hoisted (measured: the ladder "ran" 8 4M-element
multi-key sorts in 2.9 ms — impossible).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/r4_emit_speed.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu.device import encode

V = "/root/reference/test_vectors_lz4"
# text-like payload, multi-MiB: tile the two text vectors to 4 MiB
t3 = open(f"{V}/t300k.bin", "rb").read()
t1 = open(f"{V}/t1111k.bin", "rb").read()
payload = (t3 + t1) * (4 * 1024 * 1024 // len(t3 + t1) + 1)
N = 4 * 1024 * 1024
data = np.frombuffer(payload[:N], np.uint8).copy()
n_pad = N
data[-1] = 0          # the harness's per-iteration toggle byte
n_real = np.int32(N - 16)   # keep the toggle byte out of real range

buf = jnp.asarray(data)


def chained(inner):
    @functools.partial(jax.jit, static_argnames=("chain",))
    def run(b, chain):
        def body(k, acc):
            b2 = b.at[N - 1].set((k & 1).astype(jnp.uint8))
            elen, eoff = inner(b2, n_real, n_pad=n_pad)
            return (acc + elen[0].astype(jnp.int32)
                    + eoff[0].astype(jnp.int32))

        return jax.lax.fori_loop(0, chain, body, jnp.int32(0))

    return run


run_one = chained(encode._emit_inputs_device)
run_ladder = chained(encode._emit_inputs_device_ladder)


def sync(x):
    return int(jax.device_get(x))


def timed(run, chain):
    t0 = time.time()
    sync(run(buf, chain=chain))
    return time.time() - t0


REPS = 2
for run in (run_one, run_ladder):        # compile + warm
    timed(run, 1)
    timed(run, REPS)

res = {"one-sort": [], "ladder": []}
for _round in range(5):
    for name, run in (("one-sort", run_one), ("ladder", run_ladder)):
        t_small = timed(run, REPS)
        t_big = timed(run, 3 * REPS)
        res[name].append((t_big - t_small) / REPS)

print(f"\npayload {N / 1e6:.1f} MB   (emit-inputs device pass only)")
for name in res:
    s = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:9s}  {s * 1e3:8.2f} ms/pass   "
          f"{N / s / 1e6:7.1f} MB/s payload")
