"""Is the in-jit chained slope HONEST for pure-XLA sparse/stored
programs?  b3444k (stored blocks -> device copy programs) printed
device-only 2465 GB/s — past the HBM roofline (copy 3.5 MiB in+out =
7 MiB -> ~9-17 us floor at 400-800 GB/s), so XLA must be peeling the
loop and skipping the copy on non-final iterations (only o[0] is
consumed).  Compare three liveness strategies, interleaved:

  head    — probe += o[0]                  (the bench.py shape)
  barrier — outs through optimization_barrier each iteration
  sum     — probe += jnp.sum(o) (full read-back; conservative)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u exp/r4_live_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu import FOR_ALL, decompress_host
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table, plan_decode
from lz4tpu.device import sparse_decode as sp

V = "/root/reference/test_vectors_lz4"
data = open(f"{V}/b3444k.lz4", "rb").read()
buf = np.frombuffer(data, np.uint8)
parsed = parse_frames(buf, FOR_ALL)
table = build_seq_table(buf, parsed, FOR_ALL, data, pooled_cols=True)
plan = plan_decode(buf, parsed, table)
assert not plan.other and plan.fused_prep is None
sparse_progs = list(plan.sparse)
n_out = table.n_out
print(f"b3444k: {len(sparse_progs)} sparse programs, n_out={n_out}",
      flush=True)

comp_dev = jnp.asarray(buf)
ref = decompress_host(data)


def make_chain(mode):
    @jax.jit
    def chain(comp, reps):
        probe0 = jnp.zeros((), jnp.int32)

        def body(_k, carry):
            probe = jax.lax.optimization_barrier(carry)
            z = jnp.minimum(probe, 0).astype(jnp.uint8)
            c = comp + z
            outs = tuple(
                sp._compile_program(prog.ops, prog.n_out)(c)
                for _c, prog in sparse_progs
            )
            if mode == "barrier":
                outs = jax.lax.optimization_barrier(outs)
            for o in outs:
                if mode == "sum":
                    probe = probe + jnp.sum(o.astype(jnp.int32))
                else:
                    probe = probe + o[0].astype(jnp.int32)
            return probe

        return jax.lax.fori_loop(0, reps, body, probe0)

    return chain


def sync(x):
    return int(jax.device_get(x))


CHAINS = {m: make_chain(m) for m in ("head", "barrier", "sum")}


def timed(m, reps):
    t0 = time.time()
    sync(CHAINS[m](comp_dev, jnp.int32(reps)))
    return time.time() - t0


REPS = 32
for m in CHAINS:
    t = timed(m, 1)
    print(f"{m}: compile+first {t:.1f}s", flush=True)
    timed(m, REPS)

res = {m: [] for m in CHAINS}
for rnd in range(5):
    for m in CHAINS:
        t_small = timed(m, REPS)
        t_big = timed(m, 4 * REPS)
        res[m].append((t_big - t_small) / (3 * REPS))
    print("-- round %d: " % rnd + "  ".join(
        f"{m}={sorted(v)[len(v) // 2] * 1e6:.1f}us"
        for m, v in res.items()), flush=True)

print(f"\nHBM roofline floor ~9-17 us for the {n_out / 1e6:.1f} MB copy")
for m in res:
    s = sorted(res[m])[len(res[m]) // 2]
    print(f"{m:8s}  {s * 1e6:8.1f} us/decode   "
          f"{n_out / s / 1e9:8.1f} GB/s device-only", flush=True)
