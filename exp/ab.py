"""Interleaved A/B harness for dense-kernel variants on the real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/ab.py v1 v2 ...

Methodology per CLAUDE.md: stage inputs once, chain kernel calls through
the ring carry inside one jit (forces sequential execution), two-point
slope (1 chain vs 4 chains), interleave variants within each round,
median of rounds.  Variant correctness vs host engine asserted where the
variant is exact (base/rowb128/pack3); phase-ablation variants are
timing-only.
"""
from __future__ import annotations

import sys
import time
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 2048
PAGES = 256
ROWB = 256


# ---------------------------------------------------------------------------
# variant kernel bodies
# ---------------------------------------------------------------------------

def make_kernel(variant: str, n_sub: int, sub: int = SUB,
                rowb: int = ROWB, pack: int = 2):
    import math
    pages = 65536 // rowb
    align = math.gcd(sub // rowb, pages)

    def _rows(v, nrows):
        w = v.shape[1] // nrows
        return jnp.concatenate(
            [v[:, r * w:(r + 1) * w] for r in range(nrows)], axis=0
        )

    def kern(code_ref, scal_ref, ring_in_ref, out_ref, ring_out_ref, ring):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ring[...] = ring_in_ref[...]

        code = jnp.concatenate(
            [code_ref[r:r + 1, :] for r in range(8)], axis=1
        )                                             # (1, sub) int32
        is_ring = (code >> 16) & 1
        srcpos = code & 0xFFFF
        page = jnp.where(is_ring == 1, srcpos >> (rowb.bit_length() - 1), -1)
        base = ((code >> 17) & 255).astype(jnp.float32)
        lanebits = rowb - 1

        cols = sub // pack
        ps = [page[:, k * cols:(k + 1) * cols] for k in range(pack)]
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (pages, cols), 0)
        if pack == 2:
            pa, pb = ps
            collide = jnp.logical_and(pa == pb, pb >= 0)
            pb_eff = jnp.where(collide, -2, pb)
            ohp = (
                (iota_p == pa).astype(jnp.bfloat16)
                + (iota_p == pb_eff).astype(jnp.bfloat16) * 256
            )
        else:  # pack == 3
            pa, pb, pc = ps
            cb = jnp.logical_and(pb == pa, pb >= 0)
            cc_a = jnp.logical_and(pc == pa, pc >= 0)
            cc_b = jnp.logical_and(jnp.logical_and(pc == pb, pc >= 0),
                                   jnp.logical_not(cc_a))
            pb_eff = jnp.where(cb, -2, pb)
            pc_eff = jnp.where(jnp.logical_or(cc_a, cc_b), -2, pc)
            ohp = (
                (iota_p == pa).astype(jnp.bfloat16)
                + (iota_p == pb_eff).astype(jnp.bfloat16) * 256
                + (iota_p == pc_eff).astype(jnp.bfloat16) * 65536
            )

        if variant == "no_mm":
            # stand-in for the routed matrix: tile the ring (VPU/copy cost
            # only, no MXU) — timing-only variant
            yT = jnp.concatenate(
                [ring[...].astype(jnp.float32)[:rowb]] * (cols // 1), axis=1
            )[:, :cols] * ohp[:rowb, :].astype(jnp.float32)
        else:
            yT = jax.lax.dot_general(
                ring[...], ohp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # (rowb, cols)

        if variant == "mm_only":
            val = jnp.concatenate(
                [yT[:1, :]] * pack, axis=1
            )[:, :sub] + base
        elif variant == "selfirst":
            # select FIRST on the raw routed matrix (one masked sum per
            # pack slot over (rowb, cols)), extract fields on the tiny
            # (1, cols) results — extraction leaves the (rowb, *) domain
            yi = yT.astype(jnp.int32)
            qc = srcpos & lanebits
            qs = [qc[:, k * cols:(k + 1) * cols] for k in range(pack)]
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (rowb, cols), 0)
            sels = [
                jnp.sum(jnp.where(iota_r == q, yi, 0), axis=0,
                        keepdims=True)
                for q in qs
            ]
            if pack == 2:
                g0 = sels[0] & 255
                g1 = jnp.where(collide, sels[1] & 255, sels[1] >> 8)
                vali = jnp.concatenate([g0, g1], axis=1)
            else:
                g0 = sels[0] & 255
                g1 = jnp.where(cb, sels[1] & 255, (sels[1] >> 8) & 255)
                g2 = jnp.where(
                    cc_a, sels[2] & 255,
                    jnp.where(cc_b, (sels[2] >> 8) & 255, sels[2] >> 16),
                )
                vali = jnp.concatenate([g0, g1, g2], axis=1)
            val = vali.astype(jnp.float32) + base
        else:
            yi = yT.astype(jnp.int32)
            if pack == 2:
                f0 = yi & 255
                f1 = jnp.where(collide, f0, yi >> 8)
                fields = jnp.concatenate([f0, f1], axis=1)
            else:
                f0 = yi & 255
                f1 = jnp.where(cb, f0, (yi >> 8) & 255)
                f2 = jnp.where(cc_a, f0, jnp.where(cc_b, f1, yi >> 16))
                fields = jnp.concatenate([f0, f1, f2], axis=1)
            qc = srcpos & lanebits
            if variant == "nosel":
                vali = jnp.sum(fields[:8, :], axis=0, keepdims=True) * 0 + qc
            else:
                vali = jnp.sum(
                    jnp.where(
                        jax.lax.broadcasted_iota(
                            jnp.int32, (rowb, sub), 0) == qc,
                        fields, 0,
                    ),
                    axis=0, keepdims=True,
                )
            val = vali.astype(jnp.float32) + base

        row = scal_ref[i % 8, 0]
        rows_per = sub // rowb
        rowvals = _rows(val, rows_per).astype(jnp.bfloat16)
        # rows written per substep wrap past the ring end whenever
        # rows_per does not divide pages; the wrapping start rows are a
        # small static set, so emit static split stores for them
        period = pages // math.gcd(rows_per, pages)
        rows_used = sorted({(k * rows_per) % pages for k in range(period)})
        wraps = [w for w in rows_used if w + rows_per > pages]
        if not wraps:
            ring[pl.ds(pl.multiple_of(row, align), rows_per), :] = rowvals
        else:
            @pl.when(row <= pages - rows_per)
            def _():
                ring[pl.ds(pl.multiple_of(row, align), rows_per), :] = (
                    rowvals
                )

            for w in wraps:
                first = pages - w

                @pl.when(row == w)
                def _(first=first, w=w):
                    ring[w:pages, :] = rowvals[:first, :]
                    ring[0:rows_per - first, :] = rowvals[first:, :]

        out_ref[...] = _rows(val, sub // 128).astype(jnp.bfloat16)
        ring_out_ref[...] = ring[...]

    return kern, pages


@functools.partial(jax.jit, static_argnames=("variant", "n_sub", "sub",
                                             "rowb", "pack", "chain"))
def run_variant(code, scal, ring_init, *, variant, n_sub, sub=SUB,
                rowb=ROWB, pack=2, chain=1):
    kern, pages = make_kernel(variant, n_sub, sub, rowb, pack)
    if n_sub % 8:
        scal = jnp.concatenate(
            [scal, jnp.zeros((8 - n_sub % 8, 1), jnp.int32)]
        )

    def one(ring0):
        return pl.pallas_call(
            kern,
            grid=(n_sub,),
            in_specs=[
                pl.BlockSpec((8, sub // 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((pages, rowb), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((sub // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pages, rowb), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_sub * sub // 128, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((pages, rowb), jnp.bfloat16),
            ),
            scratch_shapes=[pltpu.VMEM((pages, rowb), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(code.reshape(n_sub * 8, sub // 8), scal, ring0)

    rows, ring = one(ring_init)
    if chain > 1:
        ring = jax.lax.fori_loop(
            0, chain - 1, lambda k, r: one(r)[1], ring
        )
    return rows, ring


def sync(x):
    return int(jax.device_get(jnp.sum(x[:1, :1].astype(jnp.int32))))


def pack_host(sub):
    """Host-pack t1111k with a given SUB (local copy of mxu2 numpy pack)."""
    from lz4tpu import FOR_ALL
    from lz4tpu.frame import parse_frames
    from lz4tpu.pipeline import build_seq_table

    data = open("/root/reference/test_vectors_lz4/t1111k.lz4", "rb").read()
    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    t = build_seq_table(buf, parsed, FOR_ALL, data)
    ll = t.lit_len.astype(np.int64)
    ls = t.lit_src.astype(np.int64)
    ml = t.match_len.astype(np.int64)
    mo = t.match_off.astype(np.int64)
    sizes = ll + ml
    n_out = int(sizes.sum())
    starts = np.zeros(sizes.size, np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    seq = np.repeat(np.arange(sizes.size), sizes)
    j = np.arange(n_out, dtype=np.int64)
    local = j - starts[seq]
    is_lit = local < ll[seq]
    litpos = np.where(is_lit, ls[seq] + local, 0)
    litval = buf[litpos].astype(np.int64)
    src = j - mo[seq]
    sub_base = (j // sub) * sub
    fixed = is_lit | (src < sub_base)
    h = np.where(fixed, j, src)
    k = 1
    while k < sub:
        h = h[h]
        k <<= 1
    a = h
    code = np.where(
        is_lit[a], litval[a] << 17, (src[a] & 0xFFFF) | (1 << 16)
    ).astype(np.int32)
    n_sub = -(-n_out // sub)
    flat = np.zeros(n_sub * sub, np.int32)
    flat[:n_out] = code
    scal = (
        (np.arange(n_sub, dtype=np.int32) * (sub // 256)) % 256
    ).reshape(n_sub, 1)
    return flat.reshape(n_sub, sub), scal, n_out, buf, data


def main():
    variants = sys.argv[1:] or ["base", "mm_only", "nosel", "rowb128"]
    specs = {
        "base":    dict(sub=2048, rowb=256, pack=2, variant="base"),
        "mm_only": dict(sub=2048, rowb=256, pack=2, variant="mm_only"),
        "nosel":   dict(sub=2048, rowb=256, pack=2, variant="nosel"),
        "no_mm":   dict(sub=2048, rowb=256, pack=2, variant="no_mm"),
        "rowb128": dict(sub=2048, rowb=128, pack=2, variant="base"),
        "pack3":   dict(sub=3072, rowb=256, pack=3, variant="base"),
        "p3r128":  dict(sub=3072, rowb=128, pack=3, variant="base"),
        "sub4k":   dict(sub=4096, rowb=256, pack=2, variant="base"),
        "selfirst": dict(sub=2048, rowb=256, pack=2, variant="selfirst"),
        "p3sf6k":  dict(sub=6144, rowb=256, pack=3, variant="selfirst"),
        "p3sf3k":  dict(sub=3072, rowb=256, pack=3, variant="selfirst"),
        "p3sf12k": dict(sub=12288, rowb=256, pack=3, variant="selfirst"),
        "sf4k":    dict(sub=4096, rowb=256, pack=2, variant="selfirst"),
    }
    staged = {}
    host_ref = None
    for v in variants:
        s = specs[v]
        code, scal, n_out, buf, data = pack_host(s["sub"])
        if host_ref is None:
            from lz4tpu import decompress_host
            host_ref = np.frombuffer(decompress_host(data), np.uint8)
        n_sub = code.shape[0]
        scal2 = (
            (np.arange(n_sub, dtype=np.int32) * (s["sub"] // s["rowb"]))
            % (65536 // s["rowb"])
        ).reshape(n_sub, 1)
        staged[v] = (jnp.asarray(code), jnp.asarray(scal2), n_sub, n_out,
                     s)

    # correctness for exact variants
    for v in variants:
        code_d, scal_d, n_sub, n_out, s = staged[v]
        if s["variant"] not in ("base", "selfirst"):
            continue
        rows, _ = run_variant(code_d, scal_d,
                              jnp.zeros((65536 // s["rowb"], s["rowb"]),
                                        jnp.bfloat16),
                              variant=s["variant"], n_sub=n_sub,
                              sub=s["sub"], rowb=s["rowb"], pack=s["pack"])
        got = np.asarray(jax.device_get(rows)).astype(np.uint8).reshape(-1)
        ok = bool((got[:n_out] == host_ref[:n_out]).all())
        print(f"{v}: exact={ok}")
        if not ok:
            bad = np.nonzero(got[:n_out] != host_ref[:n_out])[0]
            print("  first mismatches:", bad[:8],
                  got[bad[:8]], host_ref[bad[:8]])

    def timed(v, chain):
        code_d, scal_d, n_sub, n_out, s = staged[v]
        ring0 = jnp.zeros((65536 // s["rowb"], s["rowb"]), jnp.bfloat16)
        t0 = time.time()
        rows, ring = run_variant(code_d, scal_d, ring0,
                                 variant=s["variant"], n_sub=n_sub,
                                 sub=s["sub"], rowb=s["rowb"],
                                 pack=s["pack"], chain=chain)
        sync(ring)
        return time.time() - t0

    # warm-up compile + clock spin-up: run until per-rep stops improving
    import os
    LO = int(os.environ.get("AB_LO", "64"))
    HI = int(os.environ.get("AB_HI", "320"))
    for v in variants:
        t0 = time.time()
        timed(v, LO)
        print(f"  compile+first {v} LO: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        timed(v, HI)
        print(f"  compile+first {v} HI: {time.time()-t0:.1f}s", flush=True)
    t_prev = sum(timed(v, LO) for v in variants)
    for _ in range(12):
        t_now = sum(timed(v, LO) for v in variants)
        if t_now >= t_prev * 0.97:
            break
        t_prev = t_now

    results = {v: [] for v in variants}
    for _round in range(7):
        for v in variants:
            t4 = timed(v, LO)
            t16 = timed(v, HI)
            results[v].append((t16 - t4) / (HI - LO))
    print("\nper-decode medians (t1111k, 1.137 MB):")
    for v in variants:
        rs = sorted(results[v])
        el = rs[len(rs) // 2]
        n_sub = staged[v][2]
        n_out = staged[v][3]
        print(f"  {v:8s}: {el*1e3:7.3f} ms  "
              f"{el/n_sub*1e6:6.3f} us/substep  "
              f"{n_out/el/1e9:6.3f} GB/s   "
              f"spread [{rs[1]*1e3:.3f},{rs[-2]*1e3:.3f}]")


if __name__ == "__main__":
    main()
