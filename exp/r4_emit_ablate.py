"""Component ablation for the one-sort emit-inputs scheme: where does
the device time go?  Variants knock out pieces (timing-only; outputs
of knocked-out variants are NOT size-valid):

  full        — the product path (_emit_inputs_device semantics)
  no-gmin     — skip the four full segmented group-mins (neighbors only)
  main-bnd    — boundaries (start/after cumscans) only on 4 main
                levels; intermediate levels reuse the next-deeper main
                level's boundaries (conservative validity)
  no-gmin+mb  — both
  sorts-only  — 9-key sort + restore, trivial levels (the sort floor)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/r4_emit_ablate.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from lz4tpu.device.encode import _gram_words, _combine_levels

V = "/root/reference/test_vectors_lz4"
t3 = open(f"{V}/t300k.bin", "rb").read()
t1 = open(f"{V}/t1111k.bin", "rb").read()
import os
MB = int(os.environ.get("LZ4TPU_EMIT_MB", "4"))
payload = (t3 + t1) * (MB * 1024 * 1024 // len(t3 + t1) + 1)
N = MB * 1024 * 1024
data = np.frombuffer(payload[:N], np.uint8).copy()
n_pad = N
n_real = np.int32(N - 16)

data[-1] = 0
buf_a = jnp.asarray(data)
data[-1] = 1
buf_b = jnp.asarray(data)
BUFS = (buf_a, buf_b)

MAIN = (4, 8, 16, 32)


@functools.partial(jax.jit, static_argnames=("n_pad", "gmin_on",
                                             "main_bnd", "sorts_only"))
def emit_variant(buf, n_real, *, n_pad, gmin_on=True, main_bnd=False,
                 sorts_only=False):
    b = buf.astype(jnp.int32)
    g = _gram_words(b)
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    srt = jax.lax.sort(tuple(g) + (pos,), num_keys=9)
    ws, p_s = srt[:-1], srt[-1]
    idx = pos

    if sorts_only:
        dlev = {k: jnp.where(p_s > 0, 1, 0) for k in MAIN}
        ks = sorted(dlev)
        restored = jax.lax.sort(
            (p_s,) + tuple(dlev[k] for k in ks), num_keys=1)
        lev = [(k, jnp.where(pos + k <= n_real, c, 0))
               for k, c in zip(ks, restored[1:])]
        return _combine_levels(lev, n_real, n_pad)

    agree = idx >= 1
    agree_at = {}
    for j, w in enumerate(ws):
        agree = jnp.logical_and(agree, jnp.roll(w, 1) == w)
        agree_at[4 * (j + 1)] = agree

    # boundaries: either per level, or on main levels only with
    # intermediate levels borrowing the next-deeper main level's
    bounds = {}
    for k in (MAIN if main_bnd else sorted(agree_at)):
        bnd = jnp.logical_not(agree_at[k])
        start = jax.lax.cummax(jnp.where(bnd, idx, 0), axis=0)
        nxt = jax.lax.cummin(
            jnp.where(bnd, idx, n_pad)[::-1], axis=0)[::-1]
        after = jnp.roll(nxt, -1).at[-1].set(n_pad)
        bounds[k] = (start, after)
    if main_bnd:
        borrow = {12: 16, 20: 32, 24: 32, 28: 32}
        for k, src in borrow.items():
            bounds[k] = bounds[src]

    dlev = {}
    for k in agree_at:
        start, after = bounds[k]
        if gmin_on and k in MAIN:
            span = min(n_pad, 1 << 17)
            pm = p_s
            step = 1
            while step < span:
                ok = start <= idx - step
                pm = jnp.where(
                    ok, jnp.minimum(pm, jnp.roll(pm, step)), pm)
                step <<= 1
            sm = p_s
            step = 1
            while step < span:
                ok = after > idx + step
                sm = jnp.where(
                    ok, jnp.minimum(sm, jnp.roll(sm, -step)), sm)
                step <<= 1
            gmin = jnp.minimum(pm, sm)
        else:
            gmin = p_s

        def consider(best, c, valid):
            valid = jnp.logical_and(
                valid, jnp.logical_and(c < p_s, p_s - c <= 65535))
            return jnp.where(jnp.logical_and(valid, c > best), c, best)

        best = jnp.full((n_pad,), -1, jnp.int32)
        best = consider(best, gmin, jnp.full((n_pad,), True))
        for r in (1, 2, 4, 8, 16):
            best = consider(best, jnp.roll(p_s, r), start <= idx - r)
            best = consider(best, jnp.roll(p_s, -r), after > idx + r)
        dlev[k] = jnp.where(best >= 0, p_s - best, 0)

    ks = sorted(dlev)
    restored = jax.lax.sort(
        (p_s,) + tuple(dlev[k] for k in ks), num_keys=1)
    lev = [(k, jnp.where(pos + k <= n_real, c, 0))
           for k, c in zip(ks, restored[1:])]
    return _combine_levels(lev, n_real, n_pad)


VARIANTS = {
    "full": dict(),
    "no-gmin": dict(gmin_on=False),
    "no-gmin+mb": dict(gmin_on=False, main_bnd=True),
    "main-bnd": dict(main_bnd=True),
    "sorts-only": dict(sorts_only=True),
}


def sync(pair):
    return int(jax.device_get(pair[0][0]))


def timed(kw, reps):
    t0 = time.time()
    out = None
    for k in range(reps):
        out = emit_variant(BUFS[k & 1], n_real, n_pad=n_pad, **kw)
    sync(out)
    return time.time() - t0


for name, kw in VARIANTS.items():
    t = timed(kw, 1)
    print(f"{name}: compile+first {t:.1f}s", flush=True)
    timed(kw, 2)

res = {name: [] for name in VARIANTS}
for rnd in range(5):
    for name, kw in VARIANTS.items():
        t_small = timed(kw, 2)
        t_big = timed(kw, 6)
        res[name].append((t_big - t_small) / 4)
    # incremental medians so a mid-run kill still leaves the table
    print(f"-- round {rnd}: " + "  ".join(
        f"{n}={sorted(v)[len(v) // 2] * 1e3:.1f}ms"
        for n, v in res.items()), flush=True)

print(f"\npayload {N / 1e6:.1f} MB")
for name in res:
    s = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:11s}  {s * 1e3:8.2f} ms/pass   "
          f"{N / s / 1e6:7.1f} MB/s payload")
