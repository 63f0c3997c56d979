"""Interleaved A/B + phase ablation of the fused kernel on real TPU
(t1111k).  Variants via argv; ablated kernels produce wrong bytes by
design — timing only.  Methodology per CLAUDE.md (chained dispatches,
two-point slopes, medians after sustained warm-up).
"""
import numpy as np, time, functools
import jax, jax.numpy as jnp
from lz4tpu import FOR_ALL, decompress_host
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table
from lz4tpu.device import fused

V = "/root/reference/test_vectors_lz4"
data = open(f"{V}/t1111k.lz4", "rb").read()
buf = np.frombuffer(data, np.uint8)
parsed = parse_frames(buf, FOR_ALL)
t = build_seq_table(buf, parsed, FOR_ALL, data)
prep = fused.prep_fused(t.lit_len, t.match_len, t.match_off, t.lit_src, buf)
segs = fused.decode_fused(prep)
ref = decompress_host(data)
got = b"".join(s for _c, s in segs)
print("t1111k exact:", got == ref, " n_sub:", prep.n_sub, flush=True)
if got != ref:
    g = np.frombuffer(got, np.uint8); r = np.frombuffer(ref, np.uint8)
    bad = np.nonzero(g != r)[0]
    print("  first bad:", bad[:8], "count", bad.size)
    raise SystemExit(1)

args = [jnp.asarray(x) for x in (prep.seqrec, prep.lits, prep.winq,
        prep.scal, prep.patch)]

@functools.partial(jax.jit, static_argnames=("chain", "ablate"))
def run(seqrec, lits, winq, scal, patch, chain, ablate=frozenset()):
    ring = jnp.zeros((fused.RPAGES, fused.ROWB), jnp.bfloat16)
    def body(k, r):
        _rows, r2 = fused._decode_fused_device(
            seqrec, lits, winq, scal, patch, r, n_sub=prep.n_sub,
            ablate=ablate)
        return r2
    return jax.lax.fori_loop(0, chain, body, ring)

def sync(x):
    return int(jax.device_get(jnp.sum(x[:1, :1].astype(jnp.int32))))

VARIANTS = {
    "full": frozenset(),
    "no_expand": frozenset({"expand"}),
    "no_patch": frozenset({"patch"}),
    "no_route": frozenset({"route"}),
    "route_only": frozenset({"expand", "patch"}),
    "exp_only": frozenset({"route", "patch"}),
    "patch_only": frozenset({"route", "expand"}),
    "skel": frozenset({"route", "expand", "patch"}),
    "unified": frozenset({"unified"}),
    "ohint": frozenset({"ohint"}),
    "nosel": frozenset({"nosel"}),
    "ohint_nosel": frozenset({"ohint", "nosel"}),
}
def timed(chain, v):
    t0 = time.time(); sync(run(*args, chain=chain, ablate=VARIANTS[v]))
    return time.time() - t0

import sys
names = sys.argv[1:] or list(VARIANTS)
for v in names:
    timed(4, v); timed(20, v)
tp = sum(timed(20, v) for v in names)
for _ in range(10):
    tn = sum(timed(20, v) for v in names)
    if tn >= tp * 0.97: break
    tp = tn
res = {v: [] for v in names}
for _ in range(7):
    for v in names:
        res[v].append((timed(20, v) - timed(4, v)) / 16)
n_out = 1137664
for v in names:
    el = sorted(res[v])[3]
    print(f"  {v:10s}: {el*1e3:.3f} ms  {el/prep.n_sub*1e6:.3f} us/substep  "
          f"{n_out/el/1e9:.3f} GB/s")
