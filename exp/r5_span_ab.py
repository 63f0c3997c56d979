"""Round-5 on-chip A/B: span-split vs monolithic fused decode of
t1111k on ONE chip (round-4 verdict next-#1 "done" criterion: the
split should be ~neutral per chip — the win is that spans can run on
DIFFERENT chips, which the tunnel's single chip cannot show).

Protocol per CLAUDE.md measurement rules: both variants are ONE
compiled program each with DYNAMIC reps (fori_loop, barriered carry),
interleaved two-point slopes in one process, median of rounds.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/r5_span_ab.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu import FOR_ALL, decompress_host
from lz4tpu import spans as sp
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table, _chains_of
from lz4tpu.device import fused as fu

V = "/root/reference/test_vectors_lz4"
N_PARTS = 8
REPS = 8

data = open(f"{V}/t1111k.lz4", "rb").read()
ref = decompress_host(data)
buf = np.frombuffer(data, np.uint8)
parsed = parse_frames(buf, FOR_ALL)
t = build_seq_table(buf, parsed, FOR_ALL, data)
chain = _chains_of(t)[0]
sl = slice(chain.seq_lo, chain.seq_hi)
ll, ml, mo, ls = (t.lit_len[sl], t.match_len[sl], t.match_off[sl],
                  t.lit_src[sl])
n_out = chain.out_hi - chain.out_lo

# ---- host side: prep, split, ring seeds (timed for the report) ----
t0 = time.time()
prep = fu.prep_fused(ll, ml, mo, ls, buf, pooled=False)
t_prep = time.time() - t0
ranges = sp.plan_spans(n_out, N_PARTS)
starts = sp._starts_ext(ll, ml)
t0 = time.time()
rings = sp.resolve_rings(ll, ml, mo, ls, buf,
                         [a * sp.SUB for a, _ in ranges[1:]], starts)
t_rings = time.time() - t0
slices = []
for k, (a, b) in enumerate(ranges):
    out_len = min(b * sp.SUB, n_out) - a * sp.SUB
    slices.append((a, b, out_len, sp.slice_prep(prep, a, b, out_len)))
rp = fu.fused_rpages(prep.max_off)
sq = fu.fused_seqrows(prep.max_recs)
print(f"n_sub={prep.n_sub} spans={[(b - a) for a, b in ranges]} "
      f"rp={rp} sq={sq} prep={t_prep*1e3:.2f} ms "
      f"rings({len(rings)})={t_rings*1e3:.2f} ms", flush=True)

# ---- stage device inputs ----
mono_args = tuple(jnp.asarray(x) for x in
                  (prep.seqrec, prep.lits, prep.winq, prep.scal,
                   prep.patch))
lits_dev = mono_args[1]
span_args = []   # per span: (seqrec, winq, scal, patch, ring)
for k, (a, b, out_len, ps) in enumerate(slices):
    ring = (jnp.zeros((rp, fu.ROWB), jnp.bfloat16) if k == 0 else
            sp.ring_seed_array(rings[k - 1], a * sp.SUB, rp))
    span_args.append((
        jnp.asarray(ps.seqrec), jnp.asarray(ps.winq),
        jnp.asarray(ps.scal), jnp.asarray(ps.patch), ring,
    ))
flat_spans = [x for tup in span_args for x in tup]
span_shapes = [ps.n_sub for _a, _b, _o, ps in slices]


def _decode_spans(lits, flat):
    rows_all = []
    for k, ns in enumerate(span_shapes):
        seqrec, winq, scal, patch, ring = flat[5 * k: 5 * k + 5]
        rows, _ring = fu._decode_fused_device(
            seqrec, lits, winq, scal, patch, ring,
            n_sub=ns, rpages=rp, seq_rows=sq)
        rows_all.append(rows)
    return rows_all


@jax.jit
def spans_chain(reps, lits, *flat):
    def body(_k, probe):
        # every span's inputs are loop-invariant (fixed ring seeds), so
        # without a data dependency XLA hoists the pallas calls out of
        # the loop entirely (first run "measured" 13.7 GB/s).  Mix the
        # barriered probe into each ring (bf16 + 0.0 is exact) so every
        # iteration's launches depend on the previous iteration's rows.
        probe = jax.lax.optimization_barrier(probe)
        z = jnp.minimum(probe, 0).astype(jnp.bfloat16)
        mixed = [
            x + z if i % 5 == 4 else x for i, x in enumerate(flat)
        ]
        rows_all = _decode_spans(lits, mixed)
        rows_all = jax.lax.optimization_barrier(tuple(rows_all))
        for r in rows_all:
            probe = probe + r[0, 0].astype(jnp.int32)
        return probe

    return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))


@jax.jit
def mono_chain(reps, seqrec, lits, winq, scal, patch):
    ring0 = jnp.zeros((rp, fu.ROWB), jnp.bfloat16)

    def body(_k, carry):
        probe, ring = jax.lax.optimization_barrier(carry)
        rows, ring = fu._decode_fused_device(
            seqrec, lits, winq, scal, patch, ring,
            n_sub=prep.n_sub, rpages=rp, seq_rows=sq)
        (rows,) = jax.lax.optimization_barrier((rows,))
        return probe + rows[0, 0].astype(jnp.int32), ring

    probe, _ring = jax.lax.fori_loop(0, reps, body,
                                     (jnp.zeros((), jnp.int32), ring0))
    return probe


def sync(x):
    return int(jax.device_get(jnp.sum(x.ravel()[:1].astype(jnp.int32))))


# ---- correctness on chip: span decode == reference -----------------
got = bytearray()
for k, (a, b, out_len, ps) in enumerate(slices):
    seqrec, winq, scal, patch, ring = span_args[k]
    rows, _ = fu._decode_fused_device(
        seqrec, lits_dev, winq, scal, patch, ring,
        n_sub=ps.n_sub, rpages=rp, seq_rows=sq)
    flat = np.asarray(jax.device_get(rows)).reshape(-1)
    got += flat[:out_len].tobytes()
assert bytes(got) == ref, "span decode mismatch on chip"
print("span decode bit-exact on chip", flush=True)

t0 = time.time()
sync(mono_chain(jnp.int32(1), *mono_args))
print(f"mono program compiled+ran in {time.time()-t0:.1f} s", flush=True)
t0 = time.time()
sync(spans_chain(jnp.int32(1), lits_dev, *flat_spans))
print(f"spans program compiled+ran in {time.time()-t0:.1f} s", flush=True)


def timed(fn, reps):
    t0 = time.time()
    sync(fn(jnp.int32(reps)))
    return time.time() - t0


run_mono = lambda r: mono_chain(r, *mono_args)          # noqa: E731
run_spans = lambda r: spans_chain(r, lits_dev, *flat_spans)  # noqa: E731

# warm both, settle the clock
for fn in (run_mono, run_spans):
    timed(fn, 2)
    timed(fn, REPS)
prev = timed(run_mono, REPS)
for _ in range(10):
    now = timed(run_mono, REPS)
    if now >= prev * 0.97:
        break
    prev = now

slopes = {"mono": [], "spans": []}
for rnd in range(5):
    for name, fn in (("mono", run_mono), ("spans", run_spans)):
        t_small = timed(fn, REPS)
        t_big = timed(fn, 4 * REPS)
        slopes[name].append((t_big - t_small) / (3 * REPS))
    print(f"round {rnd}: mono {slopes['mono'][-1]*1e3:.3f} ms "
          f"spans {slopes['spans'][-1]*1e3:.3f} ms", flush=True)

med = {k: sorted(v)[len(v) // 2] for k, v in slopes.items()}
print(f"\nMEDIANS: mono {med['mono']*1e3:.3f} ms/decode "
      f"({n_out/med['mono']/1e9:.3f} GB/s device), "
      f"spans {med['spans']*1e3:.3f} ms "
      f"({n_out/med['spans']/1e9:.3f} GB/s device), "
      f"overhead {(med['spans']/med['mono']-1)*100:+.1f}%")
print(f"host: prep {t_prep*1e3:.2f} ms, {len(rings)} ring seeds "
      f"{t_rings*1e3:.2f} ms (threadable across cores)")
