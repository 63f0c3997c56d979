"""Round-4 on-chip A/B: adaptive record width (seq_rows 6 vs 8) and
gated literal-window refresh, interleaved on t1111k per the CLAUDE.md
measurement rules (chained dispatches inside one jit, two-point
slopes, medians, several interleaved rounds in ONE process).

Also prints the driver-shape per-vector device times for the current
build (the numbers BENCHMARKS.md's round-4 A/B table records).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/r4_ab.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu import FOR_ALL, decompress_host
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table
from lz4tpu.device import fused

V = "/root/reference/test_vectors_lz4"
data = open(f"{V}/t1111k.lz4", "rb").read()
buf = np.frombuffer(data, np.uint8)
parsed = parse_frames(buf, FOR_ALL)
t = build_seq_table(buf, parsed, FOR_ALL, data)
prep = fused.prep_fused(t.lit_len, t.match_len, t.match_off,
                        t.lit_src, buf)
print(f"n_sub={prep.n_sub} max_recs={prep.max_recs} "
      f"max_patches={prep.max_patches} "
      f"window reloads={int(prep.scal[:prep.n_sub, 6].sum())}"
      f"/{prep.n_sub}", flush=True)

# correctness on the real chip for both variants
ref = decompress_host(data)
for sq in (fused.fused_seqrows(prep.max_recs), 8):
    rows, _ = fused._decode_fused_device(
        jnp.asarray(prep.seqrec), jnp.asarray(prep.lits),
        jnp.asarray(prep.winq), jnp.asarray(prep.scal),
        jnp.asarray(prep.patch), n_sub=prep.n_sub, seq_rows=sq)
    flat = np.asarray(jax.device_get(rows)).reshape(-1)
    got = b"".join(
        flat[slo * fused.SUB: slo * fused.SUB + n].tobytes()
        for (_c, slo, _shi, n) in prep.out_spans)
    assert got == ref, f"seq_rows={sq} mismatch"
print("both variants bit-exact on chip", flush=True)

# no-gate variant: strip the reload flags so every substep refreshes
scal_nogate = prep.scal.copy()
scal_nogate[:, 6] = 1

args = [jnp.asarray(x) for x in (prep.seqrec, prep.lits, prep.winq,
                                 prep.scal, prep.patch)]
scal_ng = jnp.asarray(scal_nogate)


@functools.partial(jax.jit, static_argnames=("chain", "sq"))
def run(seqrec, lits, winq, scal, patch, chain, sq):
    ring = jnp.zeros((fused.RPAGES, fused.ROWB), jnp.bfloat16)

    def body(_k, r):
        r = jax.lax.optimization_barrier(r)
        _rows, r2 = fused._decode_fused_device(
            seqrec, lits, winq, scal, patch, r, n_sub=prep.n_sub,
            seq_rows=sq)
        return r2

    return jax.lax.fori_loop(0, chain, body, ring)


def sync(x):
    return int(jax.device_get(jnp.sum(x[:1, :1].astype(jnp.int32))))


VARIANTS = {
    "sq8+nogate": (scal_ng, 8),    # == round-3 kernel behavior
    "sq6+nogate": (scal_ng, fused.fused_seqrows(prep.max_recs)),
    "sq8+gate": (args[3], 8),
    "sq6+gate": (args[3], fused.fused_seqrows(prep.max_recs)),
}


def timed(chain, scal, sq):
    t0 = time.time()
    sync(run(args[0], args[1], args[2], scal, args[4],
             chain=chain, sq=sq))
    return time.time() - t0


REPS = 6
for name, (scal, sq) in VARIANTS.items():   # compile + warm
    timed(2, scal, sq)
    timed(REPS, scal, sq)

results = {k: [] for k in VARIANTS}
for _round in range(7):
    for name, (scal, sq) in VARIANTS.items():
        t_small = timed(REPS, scal, sq)
        t_big = timed(4 * REPS, scal, sq)
        results[name].append((t_big - t_small) / (3 * REPS))

print("\nvariant          us/substep   t1111k device ms   GB/s(dev)")
base = None
for name in VARIANTS:
    s = sorted(results[name])[len(results[name]) // 2]
    us = s / prep.n_sub * 1e6
    ms = s * 1e3
    gbps = len(ref) / s / 1e9
    tag = ""
    if name == "sq8+nogate":
        base = s
    elif base:
        tag = f"  ({(base - s) / base * 100:+.1f}% vs r3)"
    print(f"{name:15s}  {us:8.3f}    {ms:8.3f}          "
          f"{gbps:6.2f}{tag}")
