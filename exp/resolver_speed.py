"""Measure the XLA resolver (device/decode.py) and its phases on real
t1111k data — decides whether XLA gathers/scatter/cummax are usable for
the on-device pack, or whether everything must live in Pallas.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu import FOR_ALL
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table
from lz4tpu.device import decode as dev

data = open("/root/reference/test_vectors_lz4/t1111k.lz4", "rb").read()
buf = np.frombuffer(data, np.uint8)
parsed = parse_frames(buf, FOR_ALL)
t = build_seq_table(buf, parsed, FOR_ALL, data)
S = t.out_start.size
n_out = dev.bucket(t.n_out)
produces = (t.lit_len + t.match_len) > 0

args = dict(
    out_start=jnp.asarray(dev.pad_to(t.out_start, dev.bucket(S), t.n_out)),
    lit_len=jnp.asarray(dev.pad_to(t.lit_len, dev.bucket(S), 0)),
    lit_src=jnp.asarray(dev.pad_to(t.lit_src, dev.bucket(S), 0)),
    match_off=jnp.asarray(dev.pad_to(t.match_off, dev.bucket(S), 1)),
    produces=jnp.asarray(dev.pad_to(produces, dev.bucket(S), False)),
)
comp = jnp.asarray(dev.pad_to(buf, dev.bucket(buf.size), 0))
n_real = jnp.int32(t.n_out)


@functools.partial(jax.jit, static_argnames=("iters", "reps"))
def full(comp, out_start, lit_len, lit_src, match_off, produces, n_real,
         iters, reps):
    acc = jnp.zeros((), jnp.int32)
    for k in range(reps):
        src, unres = dev.build_sources(
            out_start, lit_len, lit_src,
            match_off + (acc & 1),             # real dep: defeats CSE
            produces, n_real, n_out, iters=iters,
        )
        out = dev.gather_bytes(comp, src)
        acc = acc + out[0].astype(jnp.int32) + unres.astype(jnp.int32)
    return acc


def sync(x):
    return int(jax.device_get(x))


def timed(iters, reps):
    t0 = time.time()
    sync(full(comp, **args, n_real=n_real, iters=iters, reps=reps))
    return time.time() - t0


# correctness once
src, unres = dev.build_sources(
    **args, n_real=n_real, n_out=n_out, iters=dev.doubling_iters(S)
)
out = np.asarray(jax.device_get(dev.gather_bytes(comp, src)))[: t.n_out]
from lz4tpu import decompress_host
ref = np.frombuffer(decompress_host(data), np.uint8)
print("resolver exact:", bool((out == ref).all()),
      " unresolved:", bool(jax.device_get(unres)))

IT = dev.doubling_iters(S)
print("doubling iters:", IT)
for it, tag in [(IT, "full"), (1, "1iter"), (0, "0iter")]:
    timed(it, 2)
    timed(it, 8)
    best = 1e9
    for _ in range(5):
        t2 = timed(it, 2)
        t8 = timed(it, 8)
        best = min(best, (t8 - t2) / 6)
    print(f"  iters={it:2d} ({tag}): {best*1e3:.3f} ms/decode "
          f"{t.n_out/best/1e9:.3f} GB/s")
