"""Phase ablation of the fused kernel on real TPU (t1111k).

Ablated kernels produce wrong bytes by design — timing only.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu import FOR_ALL
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table
from lz4tpu.device import fused

data = open("/root/reference/test_vectors_lz4/t1111k.lz4", "rb").read()
buf = np.frombuffer(data, np.uint8)
parsed = parse_frames(buf, FOR_ALL)
t = build_seq_table(buf, parsed, FOR_ALL, data)
prep = fused.prep_fused(t.lit_len, t.match_len, t.match_off,
                        t.lit_src, buf)
args = [jnp.asarray(x) for x in (prep.seqblk, prep.lits, prep.colbase,
        prep.winq, prep.scal, prep.anchors, prep.patch)]
N = prep.n_sub
n_out = 1137664


@functools.partial(jax.jit, static_argnames=("chain", "ablate"))
def run(seqblk, lits, colbase, winq, scal, anchors, patch, chain, ablate):
    ring = jnp.zeros((fused.RPAGES, fused.ROWB), jnp.bfloat16)

    def body(k, r):
        _rows, r2 = fused._decode_fused_device(
            seqblk, lits, colbase, winq, scal, anchors, patch,
            r, n_sub=N, ablate=ablate)
        return r2

    return jax.lax.fori_loop(0, chain, body, ring)


def sync(x):
    return int(jax.device_get(jnp.sum(x[:1, :1].astype(jnp.int32))))


def timed(chain, ablate):
    t0 = time.time()
    sync(run(*args, chain=chain, ablate=ablate))
    return time.time() - t0


VARIANTS = {
    "full": frozenset(),
    "no_patch": frozenset({"patch"}),
    "no_expand": frozenset({"expand"}),
    "no_route": frozenset({"route"}),
    "exp_only": frozenset({"patch", "route"}),
    "skeleton": frozenset({"patch", "route", "expand"}),
}
names = sys.argv[1:] or list(VARIANTS)
for v in names:
    timed(4, VARIANTS[v])
    timed(20, VARIANTS[v])
tp = sum(timed(20, VARIANTS[v]) for v in names)
for _ in range(10):
    tn = sum(timed(20, VARIANTS[v]) for v in names)
    if tn >= tp * 0.97:
        break
    tp = tn
res = {v: [] for v in names}
for _ in range(7):
    for v in names:
        t4 = timed(4, VARIANTS[v])
        t20 = timed(20, VARIANTS[v])
        res[v].append((t20 - t4) / 16)
print(f"n_sub={N}")
for v in names:
    el = sorted(res[v])[3]
    print(f"  {v:10s}: {el*1e3:.3f} ms  {el/N*1e6:.3f} us/substep  "
          f"{n_out/el/1e9:.3f} GB/s")
