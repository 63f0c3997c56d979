"""Interleaved A/B: fused single-kernel vs split (parallel expansion +
serial routing) on real TPU, t1111k.  Methodology per CLAUDE.md
(chained dispatches, two-point slopes, medians after sustained
warm-up, all variants interleaved in one process)."""
import numpy as np, time, functools, sys
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
ref = decompress_host(data)
args = tuple(jnp.asarray(x) for x in (prep.seqrec, prep.lits, prep.winq,
             prep.scal, prep.patch))

# correctness on-chip first
rows, _ = fused._decode_split_device(*args, n_sub=prep.n_sub)
flat = np.asarray(jax.device_get(rows)).reshape(-1)
n = prep.out_spans[0][3]
print("split exact on TPU:", bytes(flat[:n]) == ref, flush=True)
assert bytes(flat[:n]) == ref

@functools.partial(jax.jit, static_argnames=("chain", "mode"))
def run(seqrec, lits, winq, scal, patch, chain, mode):
    ring = jnp.zeros((fused.RPAGES, fused.ROWB), jnp.bfloat16)
    fn = (fused._decode_split_device if mode == "split"
          else fused._decode_fused_device)
    def body(k, r):
        _rows, r2 = fn(seqrec, lits, winq, scal, patch, r,
                       n_sub=prep.n_sub)
        return r2
    return jax.lax.fori_loop(0, chain, body, ring)

def sync(x):
    return int(jax.device_get(jnp.sum(x[:1, :1].astype(jnp.int32))))

def timed(chain, mode):
    t0 = time.time(); sync(run(*args, chain=chain, mode=mode))
    return time.time() - t0

modes = sys.argv[1:] or ["fused", "split"]
for m in modes:
    timed(4, m); timed(20, m)
tp = sum(timed(20, m) for m in modes)
for _ in range(10):
    tn = sum(timed(20, m) for m in modes)
    if tn >= tp * 0.97: break
    tp = tn
res = {m: [] for m in modes}
for _ in range(7):
    for m in modes:
        res[m].append((timed(20, m) - timed(4, m)) / 16)
n_out = 1137664
for m in modes:
    el = sorted(res[m])[3]
    print(f"  {m:6s}: {el*1e3:.3f} ms  {el/prep.n_sub*1e6:.3f} us/substep"
          f"  {n_out/el/1e9:.3f} GB/s")
