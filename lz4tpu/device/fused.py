"""Fused on-device LZ4 decode: sequence expansion + provenance routing
in ONE Pallas kernel — host work is O(sequences), not O(output bytes).

Round 1's dense engine (device/mxu2.py) resolved every output byte's
provenance on the HOST (native pack, ~4 ns/byte) and shipped a 4 B/byte
code array to the device; sustained end-to-end throughput was therefore
host-bound (round-1 verdict, weakness #2).  This engine moves the
per-byte work on-device; the host ships only O(S) sequence records plus
O(in-substep bytes) patch records (~2-6 % of output for text).

Per 2048-byte substep (SUB) the kernel:

1. **Expands** the sequence table to per-byte fields with a
   scatter-matmul + segmented prefix sum: each sequence starting in the
   substep becomes a record carrying DELTAS of three per-byte affine
   fields (U: literal-window affine constant, V: ring affine constant,
   B: literal/match boundary) split into seven balanced-base-256
   digits (each in [-128, 127] — exact in bf16).  One stacked-plane
   bf16 matmul ([row==r_k] x [lane==l_k], digit planes stacked on M)
   scatters all digits into the (16, 128) byte grid at once; a 2-D
   cumsum (lane cumsum + row carry) turns the delta maps into per-byte
   field values.  Per-chunk masked-sum expansion was 10x slower
   (measured 3.6 us/substep — sub-vreg shapes waste the VPU); XLA
   gathers are ~13 ns/element (1000x too slow).  The MXU is the only
   fast scatter on this hardware.
2. Derives each byte's **source position**: literal bytes point into a
   16-page window of the literal stream (appended to the routing
   matmul's page space), match bytes point into the 64 KiB ring
   (reference semantics: lib/lz4ada.adb:845-904).  No byte values are
   ever touched on the host — literals route through the same matmul
   as history bytes.
3. Applies **patches** for bytes whose source lies in the *current*
   substep (the ring does not hold them yet): the host resolves those
   chains (measured depth <= 6 on t1111k) and the kernel scatters the
   resolved positions with the same stacked-plane matmul trick (three
   8-bit value planes).
4. **Routes** all 2048 bytes from the [ring | literal window] page
   space with one 3-packed one-hot bf16 matmul (weights {1,256,65536};
   sums <= 255*(1+256+65536) < 2^24 stay exact in the f32 accumulator —
   the f32-mantissa bound that makes 3 bytes/column the FLOP floor),
   then selects within pages directly on the raw routed matrix (one
   masked sum per pack slot) and splits the three 8-bit fields on the
   (1, cols) results.

Field semantics (j = byte index in the substep):

  literal byte:  pos17 = j + U + U_BIAS    (window space 65536..71679)
  match byte:    pos17 = (j + V) & 0xFFFF  (ring space 0..65535)
  is_lit      =  j < B

with U = SUB + (litpos_s - window_base) - start_rel_s (bounded in
(0, 16384) by the window construction), V = (sub_base - mo_s) mod 64Ki,
B = clip(start_rel_s + lit_len_s, 0, 8191).

Record packing (two int32 streams; digits stored biased by +128, the
dV carry digit by +4):

  rec0 = pos12 | (dU0)<<12 | (dU1)<<20 | (dV2)<<28
  rec1 = (dV0) | (dV1)<<8 | (dB0)<<16 | (dB1)<<24

The routing matrix is a (272, 256) persistent scratch: rows 0..255 the
64 KiB history ring (written wrap-free — 8 rows/substep divides 256),
rows 256..271 the per-substep literal window (refreshed each substep;
window start slack <= 2047 B + consumed literals <= 2048 B < 16 pages,
a hard bound).  Chains exceeding PATCH_MAX in-substep bytes per substep
raise FusedOverflow and fall back to the host-pack engine.

ADAPTIVE RING: preps whose maximum match offset fits a narrower window
(max_off + SUB <= rpages*256 for rpages in {32, 64, 128}) dispatch a
narrow-ring kernel variant paying (rpages+16)/272 of the routing FLOPs
(fused_rpages / _make_kernel(rpages=...)).  Correct because rpages*256
divides 64 Ki, so positions mod rpages*256 stay unique within the
reachable window; shipped records are variant-independent — only
kernel-side masks and the literal-window bias change.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

SUB = 2048                 # output bytes per substep
ROWB = 256                 # ring row bytes
RPAGES = 256               # 64 KiB ring pages
WPAGES = 16                # literal window pages (4 KiB)
KPAGES = RPAGES + WPAGES   # routed page space (272)
PACK = 3                   # bytes per matmul column
COLS = 768                 # matmul columns (lane-aligned slot stride;
                           # slots cover bytes [0,768),[768,1536),
                           # [1536,2048) — the third is short)
CHUNK = 128
NCHUNK = SUB // CHUNK      # 16
SEQ_MAX = 576              # seq records per substep (>= SUB/4 + slack)
NPLANES = 7                # digit planes: dU0,dU1,dV0,dV1,dV2,dB0,dB1
PATCH_MAX = 256            # in-substep patch budget per substep
LITWIN_Q = 4096            # literal window stride (bytes; blocks 8 KiB)
TAG = 1 << 17              # patch marker above the 17-bit position space
SENTINEL = (1 << 31) - 1
U_BIAS = 65536 - SUB       # literal pos17 = j + U + U_BIAS


@dataclasses.dataclass
class FusedPrep:
    """Device-ready inputs for the fused kernel (one or more chains).

    Lifetime contract: the numpy arrays are owned by the prep buffer
    pool (``_pool_arrays``) and are recycled after ``_POOL_DEPTH`` (4)
    further same-size-class preps.  Copy them to device (jnp.asarray)
    or np.copy() them before preparing more requests; do not hold a
    FusedPrep across requests, and do not run more than _POOL_DEPTH
    concurrent preps of one size class (serve.DecodeSession's single
    prep thread satisfies this by construction).  Set
    LZ4TPU_PREP_POOL=0 to disable pooling and get caller-owned
    arrays."""

    seqrec: np.ndarray     # int32 (n_sub, 2, 8, SEQ_MAX//8) records
    lits: np.ndarray       # uint8 (n_win, 32, 256) overlapped windows
    winq: np.ndarray       # int32 [n_sub] literal window index
    scal: np.ndarray       # int32 [n_sub, 8]:
                           #   ring row, wo, wabs, U0, V0, B0, 0, 0
    patch: np.ndarray      # int32 [n_sub, 8, PATCH_MAX//8] records
    n_sub: int
    n_patches: int
    n_seq_recs: int
    out_spans: list        # [(chain_id, sub_lo, sub_hi, out_len)]
    max_off: int = 65535   # max match offset in the prep (adaptive ring)
    max_recs: int = SEQ_MAX    # max seq records in any substep
    max_patches: int = PATCH_MAX   # max patches in any substep


class FusedOverflow(Exception):
    """Chain exceeds a fused-kernel budget; caller falls back to the
    host-pack engine (device/mxu2.py)."""


def _first_seq(starts: np.ndarray, positions) -> np.ndarray:
    """Index of the sequence owning each output position."""
    return np.maximum(
        np.searchsorted(starts, positions, side="right") - 1, 0
    ).astype(np.int64)


def _digits256(x: np.ndarray, n: int):
    """Balanced base-256 digits d_k in [-128, 127] plus the remaining
    carry: x = sum d_k * 256^k + carry * 256^n."""
    digits = []
    for _ in range(n):
        d = ((x + 128) & 255) - 128
        digits.append(d)
        x = (x - d) >> 8
    return digits, x


def _resolve_patches(pst, pll, pmo, pli, positions, sub_base):
    """Resolve in-substep chains (vectorized; loop depth = chain depth,
    measured <= 6 on text).  Returns per-position source codes:
    >= 0 ring position (mod 64 Ki), < 0 literal-stream position
    encoded as -(pos)-1."""
    p = positions.copy()
    out = np.zeros(p.size, np.int64)
    active = np.ones(p.size, bool)
    rounds = 0
    while active.any():
        rounds += 1
        if rounds > 64:
            raise FusedOverflow("patch chain deeper than 64")
        act_idx = np.where(active)[0]
        s = _first_seq(pst, p[act_idx])
        local = p[act_idx] - pst[s]
        is_lit = local < pll[s]
        lit_sel = np.where(is_lit)[0]
        out[act_idx[lit_sel]] = -(pli[s[lit_sel]] + local[lit_sel]) - 1
        hop = p[act_idx] - pmo[s]
        out_of_sub = (~is_lit) & (hop < sub_base[act_idx])
        osel = np.where(out_of_sub)[0]
        out[act_idx[osel]] = hop[osel] & 0xFFFF
        still = (~is_lit) & ~out_of_sub
        p[act_idx] = np.where(still, hop, p[act_idx])
        active[:] = False
        active[act_idx[np.where(still)[0]]] = True
    return out


def _group_scatter(sub_i, recs, n_sub, cap, what):
    """Group per-record rows by substep into (n_sub, cap) slot arrays."""
    counts = np.bincount(sub_i, minlength=n_sub)
    if counts.max() > cap:
        raise FusedOverflow(
            f"{int(counts.max())} {what} per substep (budget {cap})"
        )
    order = np.argsort(sub_i, kind="stable")
    # slot[k] is the within-substep slot of the k-th SORTED record
    slot = np.arange(sub_i.size) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    outs = []
    for r in recs:
        flat = np.zeros((n_sub, cap), np.int64)
        flat[sub_i[order], slot] = r[order]
        outs.append(flat)
    return outs


def _decode_records(r0, r1):
    """Record streams -> (pos12, dU, dV, dB); numpy or jax arrays."""
    pos12 = r0 & 0xFFF
    dU = (((r0 >> 12) & 255) - 128) + ((((r0 >> 20) & 255) - 128) << 8)
    dV = (((r1 >> 0) & 255) - 128) + ((((r1 >> 8) & 255) - 128) << 8) \
        + ((((r0 >> 28) & 7) - 4) << 16)
    dB = (((r1 >> 16) & 255) - 128) + ((((r1 >> 24) & 255) - 128) << 8)
    return pos12, dU, dV, dB


def max_patches_per_substep(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    chain_ranges: list | None = None,
) -> int:
    """Exact per-substep in-substep-byte maximum in O(S + pieces).

    Diagnostic (tests + capacity analysis).  The planner deliberately
    does NOT pre-screen with this: measured on this host it costs more
    per request (~6 ms on t1111k, cache-cold next to the prep) than
    letting the native prep fail fast on its own PATCH_MAX check and
    falling back — pathological inputs pay a partial wasted prep, the
    common path pays nothing."""
    if chain_ranges is None:
        chain_ranges = [(0, lit_len.size)]
    worst = 0
    for (lo, hi) in chain_ranges:
        ll = lit_len[lo:hi].astype(np.int64)
        ml = match_len[lo:hi].astype(np.int64)
        mo = match_off[lo:hi].astype(np.int64)
        sizes = ll + ml
        n_out = int(sizes.sum())
        if n_out == 0:
            continue
        starts = np.zeros(sizes.size + 1, np.int64)
        np.cumsum(sizes, out=starts[1:])
        nbins = -(-n_out // SUB) + 1
        counts = np.zeros(nbins, np.int64)
        m0 = starts[:-1] + ll
        m1 = starts[1:]
        idx = np.where((mo < SUB) & (m1 > m0))[0]
        cur_lo, cur_mo, cur_hi = m0[idx], mo[idx], m1[idx]
        rounds = 0
        while cur_lo.size:
            rounds += 1
            if rounds > 64:
                return 1 << 30          # pathological: definitely over
            sb = (cur_lo // SUB) * SUB
            pe = np.minimum(cur_hi, sb + SUB)
            plo = np.maximum(cur_lo, sb + cur_mo)
            n_aff = np.maximum(pe - plo, 0)
            counts += np.bincount(cur_lo // SUB, weights=n_aff,
                                  minlength=nbins).astype(np.int64)
            nxt = pe < cur_hi
            cur_lo, cur_mo, cur_hi = pe[nxt], cur_mo[nxt], cur_hi[nxt]
        worst = max(worst, int(counts.max()))
    return worst


def prep_fused(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    lit_src: np.ndarray,
    buf: np.ndarray,
    chain_ranges: list | None = None,
    pre: tuple | None = None,
    pooled: bool = True,
) -> FusedPrep:
    """Build fused-kernel inputs from sequence-table ranges.

    All work is O(S + n_sub + in-substep bytes); no per-output-byte
    pass exists (that is the point — cf. module docstring).  Raises
    FusedOverflow for chains that exceed a kernel budget.

    Uses the native engine when available (lz4core.cpp
    lz4tpu_prep_fused, differential-tested against the numpy path;
    patch slot order within a substep may differ — the kernel scatter
    is order-independent).

    ``pre`` — ``(starts_ext, litpos_ext, lits_flat, max_off)`` from
    native.scan_block_full (single-chain tables only, see
    pipeline.SeqTable.pre): skips the prep's phase 1 entirely.

    ``pooled=False`` returns caller-owned arrays regardless of the
    buffer pool (callers that hold more than _POOL_DEPTH preps of one
    size class alive at once — e.g. collected span preps — must opt
    out or the pool would recycle live buffers under them)."""
    from .. import native

    if native.available():
        if (pre is not None
                and (chain_ranges is None
                     or chain_ranges == [(0, lit_len.size)])):
            return _prep_fused_native_pre(
                lit_len, match_len, match_off, lit_src, buf, pre,
                pooled=pooled,
            )
        return _prep_fused_native(
            lit_len, match_len, match_off, lit_src, buf, chain_ranges,
            pooled=pooled,
        )
    return _prep_fused_numpy(
        lit_len, match_len, match_off, lit_src, buf, chain_ranges
    )


def _build_windows(lits_flat: np.ndarray, n_win: int) -> np.ndarray:
    """Overlapped 8 KiB literal windows at 4 KiB stride (vectorized)."""
    lit_pad = np.zeros(n_win * LITWIN_Q + LITWIN_Q, np.uint8)
    lit_pad[: lits_flat.size] = lits_flat
    wins = np.empty((n_win, 32, 256), np.uint8)
    body = lit_pad[: n_win * LITWIN_Q].reshape(n_win, 16, 256)
    wins[:, :16] = body
    wins[:-1, 16:] = body[1:]
    wins[-1, 16:] = lit_pad[
        n_win * LITWIN_Q: n_win * LITWIN_Q + LITWIN_Q
    ].reshape(16, 256)
    return wins


_POOL: dict = {}
_POOL_DEPTH = 4


def _pool_arrays(nst: int, lit_cap: int, pooled: bool = True):
    """Rotating buffer pool for prep outputs.

    Fresh multi-MB numpy allocations cost ~2 ms in first-touch page
    faults per request (measured); recycling through a 4-deep rotation
    reuses warm pages.  Depth 4 keeps a buffer set untouched for three
    further requests after jnp.asarray has copied from it.  Disable
    with LZ4TPU_PREP_POOL=0."""
    import collections
    import os

    if (not pooled
            or os.environ.get("LZ4TPU_PREP_POOL", "1") == "0"
            or nst > 2048):   # pool only request-sized preps (<=8 MiB)
        return (
            np.zeros(lit_cap, np.uint8),
            np.zeros(nst, np.int32),
            np.zeros((nst, 8), np.int32),
            np.zeros((nst, 2, 8, SEQ_MAX // 8), np.int32),
            np.zeros((nst, 8, PATCH_MAX // 8), np.int32),
            np.zeros((nst, 2), np.int32),
        )
    nst_b = -(-nst // 64) * 64
    lit_b = 1 << max(12, (lit_cap - 1).bit_length())
    key = (nst_b, lit_b)
    q = _POOL.setdefault(key, collections.deque())
    if len(q) >= _POOL_DEPTH:
        # buffers come back DIRTY: the native prep writes every live
        # slot and zeroes the tails itself (fz_zero_tails, bounded by
        # the hw high-water array carried with the buffers); zero-
        # filling multi-MB arrays here cost ~0.5 ms/request
        bufs = q.popleft()
    else:
        bufs = (
            np.zeros(lit_b, np.uint8),
            np.zeros(nst_b, np.int32),
            np.zeros((nst_b, 8), np.int32),
            np.zeros((nst_b, 2, 8, SEQ_MAX // 8), np.int32),
            np.zeros((nst_b, 8, PATCH_MAX // 8), np.int32),
            np.zeros((nst_b, 2), np.int32),
        )
    q.append(bufs)
    lits_b, winq_b, scal_b, seqrec_b, patch_b, hw_b = bufs
    return (lits_b[:lit_cap], winq_b[:nst], scal_b[:nst],
            seqrec_b[:nst], patch_b[:nst], hw_b[:nst])


def _prep_fused_native_pre(lit_len, match_len, match_off, lit_src,
                           buf, pre, pooled: bool = True) -> FusedPrep:
    """Single-chain prep from scan_block_full outputs: phase 1
    (prefix sums + literal extraction) already happened at scan time;
    goes straight to the fused scal+records+patches pass
    (lz4core.cpp lz4tpu_prep_fused_pre)."""
    from .. import native

    starts_ext, litpos_ext, lits_flat, max_off = pre
    S = lit_len.size
    n_out = int(starts_ext[S]) if S else 0
    n_lit = int(litpos_ext[S]) if S else 0
    n_sub = -(-n_out // SUB) if n_out else 0
    n_win = max(1, -(-max(1, n_lit) // LITWIN_Q))
    nst = max(n_sub, 1)
    _, winq, scal, seqrec, patch, hw = _pool_arrays(nst, 1, pooled)
    out_spans = [(0, 0, n_sub, n_out)]
    if n_sub == 0:
        return FusedPrep(
            seqrec=seqrec, lits=_build_windows(lits_flat[:0], n_win),
            winq=winq, scal=scal, patch=patch,
            n_sub=0, n_patches=0, n_seq_recs=0,
            out_spans=out_spans, max_off=max(1, int(max_off)),
        )
    buf8 = np.ascontiguousarray(buf, np.uint8)
    try:
        n_recs, n_patches, max_recs, max_patches = \
            native.prep_fused_chain_pre(
            np.ascontiguousarray(lit_len, np.int32),
            np.ascontiguousarray(match_len, np.int32),
            np.ascontiguousarray(match_off, np.int32),
            np.ascontiguousarray(lit_src, np.int32),
            buf8, n_win, starts_ext, litpos_ext, lits_flat, n_out,
            winq[:n_sub], scal[:n_sub], seqrec[:n_sub], patch[:n_sub],
            hw[:n_sub],
        )
    except ValueError as exc:
        raise FusedOverflow(str(exc)) from None
    return FusedPrep(
        seqrec=seqrec, lits=_build_windows(lits_flat[:n_lit], n_win),
        winq=winq, scal=scal, patch=patch,
        n_sub=n_sub, n_patches=n_patches, n_seq_recs=n_recs,
        out_spans=out_spans, max_off=max(1, int(max_off)),
        max_recs=max_recs, max_patches=max_patches,
    )


def _prep_fused_native(lit_len, match_len, match_off, lit_src, buf,
                       chain_ranges, pooled: bool = True) -> FusedPrep:
    from .. import native

    if chain_ranges is None:
        chain_ranges = [(0, lit_len.size)]
    metas = []
    lit_acc = 0
    n_sub_total = 0
    for cid, (lo, hi) in enumerate(chain_ranges):
        n_lit = int(np.sum(lit_len[lo:hi], dtype=np.int64))
        n_out = n_lit + int(np.sum(match_len[lo:hi], dtype=np.int64))
        n_sub_c = -(-n_out // SUB) if n_out else 0
        metas.append((cid, lo, hi, n_lit, n_out, n_sub_c,
                      lit_acc, n_sub_total))
        lit_acc += n_lit
        n_sub_total += n_sub_c
    n_win = max(1, -(-max(1, lit_acc) // LITWIN_Q))
    nst = max(n_sub_total, 1)
    lits_flat, winq, scal, seqrec, patch, hw = _pool_arrays(
        nst, max(lit_acc, 1), pooled
    )
    out_spans = []
    buf8 = np.ascontiguousarray(buf, np.uint8)

    def _one(meta):
        (cid, lo, hi, n_lit, n_out, n_sub_c, lit_base, sub0) = meta
        return native.prep_fused_chain(
            np.ascontiguousarray(lit_len[lo:hi], np.int32),
            np.ascontiguousarray(match_len[lo:hi], np.int32),
            np.ascontiguousarray(match_off[lo:hi], np.int32),
            np.ascontiguousarray(lit_src[lo:hi], np.int32),
            buf8, lit_base, n_win,
            lits_flat[lit_base:lit_base + max(n_lit, 1)],
            winq[sub0:sub0 + n_sub_c],
            scal[sub0:sub0 + n_sub_c],
            seqrec[sub0:sub0 + n_sub_c],
            patch[sub0:sub0 + n_sub_c],
            hw[sub0:sub0 + n_sub_c],
        )

    live = [m for m in metas if m[5] > 0]
    for (cid, _lo, _hi, _nl, n_out, n_sub_c, _lb, sub0) in metas:
        out_spans.append((cid, sub0, sub0 + n_sub_c, n_out))
    threads = native.pack_threads()
    try:
        if len(live) > 1 and threads > 1:
            # chains prep independently into disjoint array views and
            # the C function releases the GIL (ctypes): thread-pool
            # across chains (multi-frame / independent-block inputs)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(threads, len(live))
            ) as ex:
                results = list(ex.map(_one, live))
        else:
            results = [_one(m) for m in live]
    except ValueError as exc:
        raise FusedOverflow(str(exc)) from None
    n_recs = sum(r[0] for r in results)
    n_patches = sum(r[1] for r in results)
    max_recs = max((r[2] for r in results), default=0)
    max_patches = max((r[3] for r in results), default=0)
    max_off = 1
    for (cid, lo, hi, _nl, _no, n_sub_c, _lb, _s0) in metas:
        if n_sub_c and hi > lo:
            max_off = max(max_off, int(match_off[lo:hi].max()))
    return FusedPrep(
        seqrec=seqrec, lits=_build_windows(lits_flat[:lit_acc], n_win),
        winq=winq, scal=scal, patch=patch,
        n_sub=n_sub_total, n_patches=n_patches, n_seq_recs=n_recs,
        out_spans=out_spans, max_off=max_off,
        max_recs=max_recs, max_patches=max_patches,
    )


def _prep_fused_numpy(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    lit_src: np.ndarray,
    buf: np.ndarray,
    chain_ranges: list | None = None,
) -> FusedPrep:
    """Pure-numpy prep (fallback + differential reference)."""
    if chain_ranges is None:
        chain_ranges = [(0, lit_len.size)]

    # ---- pass 1: per-chain literal streams --------------------------
    chain_meta = []
    lit_parts = []
    lit_acc = 0
    n_sub_total = 0
    for cid, (lo, hi) in enumerate(chain_ranges):
        ll = lit_len[lo:hi].astype(np.int64)
        ml = match_len[lo:hi].astype(np.int64)
        mo = match_off[lo:hi].astype(np.int64)
        ls = lit_src[lo:hi].astype(np.int64)
        sizes = ll + ml
        n_out = int(sizes.sum())
        n_sub_c = -(-n_out // SUB) if n_out else 0
        starts = np.zeros(sizes.size + 1, np.int64)
        np.cumsum(sizes, out=starts[1:])
        litpos = np.zeros(ll.size + 1, np.int64)
        np.cumsum(ll, out=litpos[1:])
        litpos += lit_acc
        n_lit = int(ll.sum())
        if n_lit:
            lseq = np.repeat(np.arange(ll.size), ll)
            lloc = (np.arange(n_lit, dtype=np.int64)
                    - np.repeat(litpos[:-1] - lit_acc, ll))
            lit_parts.append(buf[ls[lseq] + lloc])
        chain_meta.append(dict(
            cid=cid, starts=starts, ll=ll, mo=mo, litpos=litpos,
            n_out=n_out, n_sub=n_sub_c, sub0=n_sub_total,
        ))
        lit_acc += n_lit
        n_sub_total += n_sub_c
    lits_flat = (np.concatenate(lit_parts) if lit_parts
                 else np.zeros(0, np.uint8))
    n_win = max(1, -(-max(1, lits_flat.size) // LITWIN_Q))
    nst = max(n_sub_total, 1)

    # ---- pass 2: per-substep scalars, seq records, patches ----------
    scal = np.zeros((nst, 8), np.int32)
    winq = np.zeros(nst, np.int32)
    all_rec_sub, all_rec0, all_rec1 = [], [], []
    all_pat_sub, all_pat = [], []
    out_spans = []
    for m in chain_meta:
        cid, sub0, n_sub_c = m["cid"], m["sub0"], m["n_sub"]
        out_spans.append((cid, sub0, sub0 + n_sub_c, m["n_out"]))
        if n_sub_c == 0:
            continue
        starts, ll, mo, litpos = (m["starts"], m["ll"], m["mo"],
                                  m["litpos"])
        S = ll.size
        n_out = m["n_out"]
        pst = np.concatenate([starts[:-1], [n_out], [np.int64(SENTINEL)]])
        pll = np.concatenate([ll, [0, 0]])
        pmo = np.concatenate([mo, [1, 1]])
        pli = np.concatenate([litpos[:-1], [litpos[-1], litpos[-1]]])

        sub_ids = np.arange(n_sub_c, dtype=np.int64)
        sub_starts = sub_ids * SUB
        s0 = _first_seq(pst, sub_starts)
        # literal window per substep: first literal-stream byte consumed
        local0 = sub_starts - pst[s0]
        consumed = pli[s0] + np.minimum(np.maximum(local0, 0), pll[s0])
        wq = np.minimum(consumed // LITWIN_Q, n_win - 1)
        wo = ((consumed - wq * LITWIN_Q) >> 8) & ~np.int64(7)
        wabs = wq * (LITWIN_Q >> 8) + wo
        wb = wabs << 8
        winq[sub0:sub0 + n_sub_c] = wq
        scal[sub0:sub0 + n_sub_c, 0] = (sub_ids * (SUB // ROWB)) % RPAGES
        scal[sub0:sub0 + n_sub_c, 1] = wo
        scal[sub0:sub0 + n_sub_c, 2] = wabs

        # carry values: fields of the seq owning the last byte BEFORE
        # each substep (clipped — only read until the first record)
        cs = _first_seq(pst, np.maximum(sub_starts - 1, 0))
        u0 = np.clip(SUB + (pli[cs] - wb) - (pst[cs] - sub_starts),
                     0, 16383)
        v0 = (sub_starts - pmo[cs]) & 0xFFFF
        b0 = np.clip(pst[cs] + pll[cs] - sub_starts, 0, 8191)
        scal[sub0:sub0 + n_sub_c, 3] = u0
        scal[sub0:sub0 + n_sub_c, 4] = v0
        scal[sub0:sub0 + n_sub_c, 5] = b0
        # window-reload flag: substep 0 (incl. chain starts) and every
        # (winq, wabs) transition; the kernel skips the literal-window
        # VMEM refresh when 0
        flag = np.ones(n_sub_c, np.int64)
        if n_sub_c > 1:
            flag[1:] = ((wq[1:] != wq[:-1])
                        | (wabs[1:] != wabs[:-1])).astype(np.int64)
        scal[sub0:sub0 + n_sub_c, 6] = flag

        # ---- per-seq records (zero-output sequences dropped) --------
        sizes_s = pst[1:S + 1] - pst[:S]
        val = np.where(sizes_s > 0)[0]
        if val.size:
            st_v = pst[val]
            sub_i = st_v // SUB
            pos12 = st_v - sub_i * SUB
            U = SUB + (pli[val] - wb[sub_i]) - pos12
            if U.min() <= 0 or U.max() >= 16384:
                raise FusedOverflow("literal affine constant range")
            V = (sub_i * SUB - pmo[val]) & 0xFFFF
            B = np.clip(pos12 + pll[val], 0, 8191)
            same = np.zeros(val.size, bool)
            same[1:] = sub_i[1:] == sub_i[:-1]
            pU = np.where(same, np.roll(U, 1), u0[sub_i])
            pV = np.where(same, np.roll(V, 1), v0[sub_i])
            pB = np.where(same, np.roll(B, 1), b0[sub_i])
            (du0, du1), cu = _digits256(U - pU, 2)
            (dv0, dv1), cv = _digits256(V - pV, 2)
            (db0, db1), cb = _digits256(B - pB, 2)
            if (cu != 0).any() or (cb != 0).any() or (np.abs(cv) > 3).any():
                raise FusedOverflow("field delta exceeds digit range")
            rec0 = (pos12 | ((du0 + 128) << 12) | ((du1 + 128) << 20)
                    | ((cv + 4) << 28))
            rec1 = ((dv0 + 128) | ((dv1 + 128) << 8)
                    | ((db0 + 128) << 16) | ((db1 + 128) << 24))
            all_rec_sub.append(sub0 + sub_i)
            all_rec0.append(rec0)
            all_rec1.append(rec1)

        # ---- in-substep patches (vectorized over sequences) ---------
        m0 = pst[:S] + ll
        m1 = pst[1:S + 1]
        idx = np.where((mo < SUB) & (m1 > m0))[0]
        pos_parts = []
        cur_lo, cur_mo, cur_hi = m0[idx], mo[idx], m1[idx]
        rounds = 0
        while cur_lo.size:
            rounds += 1
            if rounds > 64:
                raise FusedOverflow("match spans cross >64 substeps")
            sb = (cur_lo // SUB) * SUB
            pe = np.minimum(cur_hi, sb + SUB)
            plo = np.maximum(cur_lo, sb + cur_mo)
            n_aff = np.maximum(pe - plo, 0)
            keep = n_aff > 0
            if keep.any():
                reps = n_aff[keep]
                base = np.repeat(plo[keep], reps)
                offs = (np.arange(int(reps.sum()), dtype=np.int64)
                        - np.repeat(np.cumsum(reps) - reps, reps))
                pos_parts.append(base + offs)
            nxt = pe < cur_hi
            cur_lo, cur_mo, cur_hi = pe[nxt], cur_mo[nxt], cur_hi[nxt]
        if pos_parts:
            pos = np.concatenate(pos_parts)
            sbp = (pos // SUB) * SUB
            res = _resolve_patches(pst, pll, pmo, pli, pos, sbp)
            sub_i = pos // SUB
            pwb = wb[sub_i]
            lit_rel = (-res - 1) - pwb
            is_l = res < 0
            if is_l.any() and (lit_rel[is_l].min() < 0
                               or lit_rel[is_l].max() >= WPAGES * 256):
                raise FusedOverflow("patch literal outside window")
            pos17 = np.where(is_l, 65536 + lit_rel, res)
            all_pat_sub.append(sub0 + sub_i)
            all_pat.append(((pos - sub_i * SUB) << 18) | pos17 | TAG)

    # ---- literal stream as overlapped 8 KiB windows -----------------
    wins = _build_windows(lits_flat, n_win)

    # ---- grouped record blocks --------------------------------------
    n_seq_recs = 0
    max_recs = 0
    seqrec = np.zeros((nst, 2, 8, SEQ_MAX // 8), np.int32)
    if all_rec0:
        sub_i = np.concatenate(all_rec_sub)
        r0 = np.concatenate(all_rec0)
        r1 = np.concatenate(all_rec1)
        n_seq_recs = r0.size
        max_recs = int(np.bincount(sub_i, minlength=nst).max())
        g0, g1 = _group_scatter(sub_i, [r0, r1], nst, SEQ_MAX,
                                "seq records")
        seqrec[:, 0] = g0.reshape(nst, 8, SEQ_MAX // 8)
        seqrec[:, 1] = g1.reshape(nst, 8, SEQ_MAX // 8)
    n_patches = 0
    max_patches = 0
    patch = np.zeros((nst, 8, PATCH_MAX // 8), np.int32)
    if all_pat:
        sub_i = np.concatenate(all_pat_sub)
        rec = np.concatenate(all_pat)
        n_patches = rec.size
        max_patches = int(np.bincount(sub_i, minlength=nst).max())
        (g,) = _group_scatter(sub_i, [rec], nst, PATCH_MAX, "patches")
        patch = g.reshape(nst, 8, PATCH_MAX // 8).astype(np.int32)

    max_off = 1
    for cid, (lo, hi) in enumerate(chain_ranges):
        if hi > lo and chain_meta[cid]["n_sub"]:
            max_off = max(max_off, int(match_off[lo:hi].max()))
    return FusedPrep(
        seqrec=seqrec, lits=wins, winq=winq, scal=scal, patch=patch,
        n_sub=n_sub_total, n_patches=n_patches, n_seq_recs=n_seq_recs,
        out_spans=out_spans, max_off=max_off,
        max_recs=max_recs, max_patches=max_patches,
    )


# ---------------------------------------------------------------------------
# numpy golden model of the kernel semantics (tests compare both ways:
# golden vs host engine, and Pallas kernel vs golden)
# ---------------------------------------------------------------------------

def golden_decode(prep: FusedPrep, ring_init=None) -> np.ndarray:
    """Reference implementation of the kernel's per-substep math —
    identical record decoding, scatter + prefix fill, patch override
    and source-position semantics; byte values read directly.

    ``ring_init``: optional uint8[65536] history seed in ring layout
    (flat index = chain output position mod 64 Ki) for span decode —
    the numpy analog of the kernel's ring_in (single-chain preps
    only; multi-chain preps reset the ring at every chain start)."""
    ring = np.zeros(65536, np.uint8)
    if ring_init is not None:
        ring[:] = ring_init
    lit_flat = np.zeros((prep.lits.shape[0] + 1) * LITWIN_Q, np.uint8)
    for w in range(prep.lits.shape[0]):
        lit_flat[w * LITWIN_Q: w * LITWIN_Q + 8192] = (
            prep.lits[w].reshape(-1)
        )
    out = np.zeros(prep.n_sub * SUB, np.uint8)
    chain_start = {slo for (_c, slo, shi, _n) in prep.out_spans
                   if shi > slo}
    if ring_init is not None:
        assert chain_start <= {0}, "ring_init is single-chain only"
        chain_start = set()
    jrel = np.arange(SUB, dtype=np.int64)
    for i in range(prep.n_sub):
        if i in chain_start:
            ring[:] = 0
        wabs = int(prep.scal[i, 2])
        win = lit_flat[wabs * 256: wabs * 256 + WPAGES * 256]
        u0, v0, b0 = (int(prep.scal[i, 3]), int(prep.scal[i, 4]),
                      int(prep.scal[i, 5]))
        r0 = prep.seqrec[i, 0].reshape(-1).astype(np.int64)
        r1 = prep.seqrec[i, 1].reshape(-1).astype(np.int64)
        live = r0 != 0
        pos12, dU, dV, dB = _decode_records(r0, r1)
        dmapU = np.zeros(SUB, np.int64)
        dmapV = np.zeros(SUB, np.int64)
        dmapB = np.zeros(SUB, np.int64)
        np.add.at(dmapU, pos12[live], dU[live])
        np.add.at(dmapV, pos12[live], dV[live])
        np.add.at(dmapB, pos12[live], dB[live])
        U = u0 + np.cumsum(dmapU)
        V = v0 + np.cumsum(dmapV)
        B = b0 + np.cumsum(dmapB)
        is_lit = jrel < B
        pos17 = np.where(is_lit, jrel + U + U_BIAS,
                         (jrel + V) & 0xFFFF)
        pv = np.zeros(SUB, np.int64)
        recs = prep.patch[i].reshape(-1).astype(np.int64)
        for r in recs[recs != 0]:
            pv[int(r) >> 18] = int(r) & 0x3FFFF
        pos17 = np.where(pv >= TAG, pv - TAG, pos17)
        vals = np.where(
            pos17 >= 65536,
            win[np.clip(pos17 - 65536, 0, WPAGES * 256 - 1)],
            ring[np.clip(pos17, 0, 65535)],
        ).astype(np.uint8)
        out[i * SUB:(i + 1) * SUB] = vals
        row = int(prep.scal[i, 0])
        ring.reshape(RPAGES, ROWB)[row:row + SUB // ROWB] = (
            vals.reshape(SUB // ROWB, ROWB)
        )
    return out


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _make_kernel(ablate: frozenset = frozenset(), rpages: int = RPAGES,
                 seq_rows: int = 8):
    """ablate is an internal perf-ablation knob (exp/ harnesses only):
    'expand' short-circuits the record scatter+fill, 'patch' the patch
    matmul, 'route' the routing matmul+select.  Production callers
    never pass it; ablated kernels produce wrong bytes by design.

    ``rpages`` selects the ADAPTIVE RING (round-2 verdict next-#2):
    when every match offset in the prep satisfies
    max_off + SUB <= rpages*256, a narrow ring of rpages pages is a
    faithful window (offsets mod rpages*256 stay unique because
    rpages*256 divides 64 Ki) and the routing matmul pays
    (rpages+WPAGES)/272 of the full-ring FLOPs.  The shipped records
    are variant-independent; only kernel-side masks and the literal-
    window bias change.

    ``seq_rows`` selects the ADAPTIVE RECORD WIDTH: record slots fill
    the (8, SEQ_MAX//8) block row-major from slot 0, so when no substep
    holds more than seq_rows*(SEQ_MAX//8) records (prep.max_recs), the
    expansion only needs the first seq_rows rows — the scatter matmul's
    K and the VPU hit-matrix build shrink proportionally (t1111k:
    max 428 records/substep vs the 576 budget -> 6 rows, a 25% cut of
    the expansion stage).  The scatter is order-independent, so reading
    a slot prefix is exact as long as every live record is included."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    seq_k = seq_rows * (SEQ_MAX // 8)
    kpages = rpages + WPAGES
    rmask = rpages * 256 - 1
    u_bias = rpages * 256 - SUB

    def _rows(v, nrows):
        """(1, N) -> (nrows, N/nrows) via lane slices + sublane concat
        (Mosaic rejects the equivalent reshape in this layout)."""
        w = v.shape[1] // nrows
        return jnp.concatenate(
            [v[:, r * w:(r + 1) * w] for r in range(nrows)], axis=0
        )

    def _pad_cols(v, width, fill):
        pad = jnp.full((1, width - v.shape[1]), fill, v.dtype)
        return jnp.concatenate([v, pad], axis=1)

    def _cum2d(x):
        """Row-major 2-D prefix sum over the (NCHUNK, CHUNK) byte grid:
        lane cumsum within rows plus a running row carry (log-shift
        adds — Mosaic has no cumsum primitive)."""
        zeros = functools.partial(jnp.zeros, dtype=x.dtype)
        c = x
        k = 1
        while k < CHUNK:                     # inclusive lane prefix
            c = c + jnp.concatenate(
                [zeros((NCHUNK, k)), c[:, :CHUNK - k]], axis=1)
            k <<= 1
        s = x
        k = 1
        while k < CHUNK:                     # inclusive lane suffix
            s = s + jnp.concatenate(
                [s[:, k:], zeros((NCHUNK, k))], axis=1)
            k <<= 1
        m = c + s - x                        # row total, all lanes
        q = m
        k = 1
        while k < NCHUNK:                    # inclusive sublane prefix
            q = q + jnp.concatenate(
                [zeros((k, CHUNK)), q[:NCHUNK - k]], axis=0)
            k <<= 1
        return c + q - m                     # c + exclusive row carry

    unified = "unified" in ablate

    def kern(wq_ref, seqrec_ref, lit_ref, scal_ref, patch_ref,
             ring_in_ref, out_ref, ring_out_ref, kmat, pscr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            kmat[0:rpages, :] = ring_in_ref[...]

        # literal window pages -> the rows above the ring (u8 -> i32
        # -> bf16: Mosaic has no direct u8->bf16 cast).  Gated on the
        # prep's reload flag (scal[6]): consecutive substeps usually
        # share the window, and rows >= rpages are written nowhere
        # else, so skipping the refresh when unchanged is sound.  Grid
        # step 0 always loads: a part-split launch starts with fresh
        # (garbage) scratch even when its first substep's flag is 0.
        @pl.when((i == 0) | (scal_ref[i % 8, 6] != 0))
        def _():
            wo = scal_ref[i % 8, 1]
            win = lit_ref[0, pl.ds(pl.multiple_of(wo, 8), WPAGES), :]
            kmat[rpages:kpages, :] = win.astype(jnp.int32).astype(
                jnp.bfloat16)

        if unified:
            # ---- ONE scatter matmul for seq records AND patches ----
            # (three differently-shaped matmuls per body stall the MXU
            # pipeline between shape switches — measured ~0.9 us when
            # the 96x768 patch matmul joins the routing matmul; one
            # 320x1856 scatter wins despite 60% more FLOPs)
            K = SEQ_MAX + PATCH_MAX
            r0 = jnp.concatenate(
                [seqrec_ref[0, 0, r:r + 1, :] for r in range(8)], axis=1
            )
            r1 = jnp.concatenate(
                [seqrec_ref[0, 1, r:r + 1, :] for r in range(8)], axis=1
            )
            live = r0 != 0
            pos12 = r0 & 0xFFF
            planes = [
                ((r0 >> 12) & 255) - 128,
                ((r0 >> 20) & 255) - 128,
                (r1 & 255) - 128,
                ((r1 >> 8) & 255) - 128,
                ((r0 >> 28) & 7) - 4,
                ((r1 >> 16) & 255) - 128,
                ((r1 >> 24) & 255) - 128,
            ]
            prec = jnp.concatenate(
                [patch_ref[0, r:r + 1, :] for r in range(8)], axis=1
            )
            ppos = prec >> 18
            code18 = prec & 0x3FFFF
            pplanes = [code18 & 255, (code18 >> 8) & 255, code18 >> 16]
            zs = jnp.zeros((1, SEQ_MAX), jnp.int32)
            zp = jnp.zeros((1, PATCH_MAX), jnp.int32)
            pos_all = jnp.concatenate([pos12, ppos], axis=1)   # (1, K)
            r_all = pos_all >> 7
            l_all = pos_all & 127
            hit = (jax.lax.broadcasted_iota(
                jnp.int32, (NCHUNK, K), 0) == r_all).astype(jnp.int32)
            rows = [
                jnp.concatenate([jnp.where(live, pp, 0), zp], axis=1)
                for pp in planes
            ] + [jnp.concatenate([zs, pp], axis=1) for pp in pplanes]
            A = jnp.concatenate(
                [(hit * r).astype(jnp.bfloat16) for r in rows], axis=0
            )                                    # (10*NCHUNK, K)
            B = (jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, K), 0) == l_all).astype(jnp.bfloat16)
            ps = jax.lax.dot_general(
                A, B, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)                  # (10*NCHUNK, 128)
            n = NCHUNK
            dUm = ps[0:n] + (ps[n:2 * n] << 8)
            dVm = (ps[2 * n:3 * n] + (ps[3 * n:4 * n] << 8)
                   + (ps[4 * n:5 * n] << 16))
            dBm = ps[5 * n:6 * n] + (ps[6 * n:7 * n] << 8)
            pv = (ps[7 * n:8 * n] + (ps[8 * n:9 * n] << 8)
                  + (ps[9 * n:] << 16))
            U = _cum2d(dUm) + scal_ref[i % 8, 3]
            V = _cum2d(dVm) + scal_ref[i % 8, 4]
            Bb = _cum2d(dBm) + scal_ref[i % 8, 5]
            jrow = (jax.lax.broadcasted_iota(
                jnp.int32, (NCHUNK, CHUNK), 0) * CHUNK
                + jax.lax.broadcasted_iota(
                    jnp.int32, (NCHUNK, CHUNK), 1))
            pos17g = jnp.where(jrow < Bb, jrow + U + U_BIAS,
                               (jrow + V) & 0xFFFF)
            pos17g = jnp.where(pv >= TAG, pv - TAG, pos17g)

        # ---- seq-record scatter: stacked digit planes, one matmul ----
        if unified:
            pass
        elif "expand" in ablate:
            pos17g = (jax.lax.broadcasted_iota(
                jnp.int32, (NCHUNK, CHUNK), 0) * CHUNK
                + jax.lax.broadcasted_iota(
                    jnp.int32, (NCHUNK, CHUNK), 1)) & rmask
        else:
            # matmul-fused 2-D prefix (see _make_expand_kernel's
            # docstring): B pairs [lane>=l_k] with all-ones and A adds
            # the [row>r_k] hit block, so the scatter matmul emits
            # PREFIXED digit planes directly — replaces cum2d's
            # lane-shift log-prefix (measured 0.57 us/substep).
            r0 = jnp.concatenate(
                [seqrec_ref[0, 0, r:r + 1, :] for r in range(seq_rows)],
                axis=1
            )                                    # (1, seq_k)
            r1 = jnp.concatenate(
                [seqrec_ref[0, 1, r:r + 1, :] for r in range(seq_rows)],
                axis=1
            )
            live = r0 != 0                       # cv+4 in [1,7]: real
            pos12 = r0 & 0xFFF                   # records are nonzero
            planes = [
                ((r0 >> 12) & 255) - 128,        # dU0
                ((r0 >> 20) & 255) - 128,        # dU1
                (r1 & 255) - 128,                # dV0
                ((r1 >> 8) & 255) - 128,         # dV1
                ((r0 >> 28) & 7) - 4,            # dV2 (carry digit)
                ((r1 >> 16) & 255) - 128,        # dB0
                ((r1 >> 24) & 255) - 128,        # dB1
            ]
            r_s = pos12 >> 7
            l_s = pos12 & 127
            iota_r = jax.lax.broadcasted_iota(
                jnp.int32, (NCHUNK, seq_k), 0)
            hit_eq = (iota_r == r_s).astype(jnp.int32)
            hit_lt = (iota_r > r_s).astype(jnp.int32)
            A = jnp.concatenate(
                [jnp.concatenate(
                    [(hit_eq * jnp.where(live, p, 0)
                      ).astype(jnp.bfloat16),
                     (hit_lt * jnp.where(live, p, 0)
                      ).astype(jnp.bfloat16)], axis=1)
                 for p in planes], axis=0
            )                                    # (7*NCHUNK, 2*seq_k)
            lane_ge = (jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, seq_k), 0) >= l_s
            ).astype(jnp.bfloat16)
            B = jnp.concatenate(
                [lane_ge, jnp.ones((CHUNK, seq_k), jnp.bfloat16)],
                axis=1)                          # (CHUNK, 2*seq_k)
            ps = jax.lax.dot_general(
                A, B, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)                  # (7*NCHUNK, CHUNK)
            n = NCHUNK
            U = ps[0:n] + (ps[n:2 * n] << 8) + scal_ref[i % 8, 3]
            V = (ps[2 * n:3 * n] + (ps[3 * n:4 * n] << 8)
                 + (ps[4 * n:5 * n] << 16)) + scal_ref[i % 8, 4]
            Bb = (ps[5 * n:6 * n] + (ps[6 * n:7 * n] << 8)
                  + scal_ref[i % 8, 5])
            jrow = (jax.lax.broadcasted_iota(
                jnp.int32, (NCHUNK, CHUNK), 0) * CHUNK
                + jax.lax.broadcasted_iota(
                    jnp.int32, (NCHUNK, CHUNK), 1))
            pos17g = jnp.where(jrow < Bb, jrow + U + u_bias,
                               (jrow + V) & rmask)

        # ---- patch scatter: stacked-plane bf16 outer product ----
        if "patch" not in ablate and not unified:
            prec = jnp.concatenate(
                [patch_ref[0, r:r + 1, :] for r in range(8)], axis=1
            )                                    # (1, PATCH_MAX)
            ppos = prec >> 18
            code18 = prec & 0x3FFFF
            pr = ppos >> 7
            phit = (jax.lax.broadcasted_iota(
                jnp.int32, (NCHUNK, PATCH_MAX), 0) == pr
            ).astype(jnp.int32)
            pplanes = [code18 & 255, (code18 >> 8) & 255, code18 >> 16]
            pA = jnp.concatenate(
                [(phit * p).astype(jnp.bfloat16) for p in pplanes],
                axis=0,
            )                                    # (3*NCHUNK, PATCH_MAX)
            pB = (jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, PATCH_MAX), 0) == (ppos & 127)
            ).astype(jnp.bfloat16)
            psum = jax.lax.dot_general(
                pA, pB, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)                  # (3*NCHUNK, CHUNK)
            pv = (psum[0:NCHUNK] + (psum[NCHUNK:2 * NCHUNK] << 8)
                  + (psum[2 * NCHUNK:] << 16))
            if "patchnop" in ablate:   # timing probe: matmul runs, the
                pos17g = pos17g + (pv & 0)   # join is a no-op add
            else:
                # patch codes are full-ring (mod 64 Ki) ring positions or
                # 65536+lit_rel window positions; remap into the
                # variant's page space (identity when rpages == 256)
                code = pv - TAG
                code = jnp.where(code >= 65536,
                                 code - 65536 + rpages * 256,
                                 code & rmask)
                pos17g = jnp.where(pv >= TAG, code, pos17g)

        # (NCHUNK, CHUNK) row-major -> (1, SUB) lane-major.  The
        # round trip through VMEM is deliberate: slices of a live
        # VALUE keep their sublane offsets (r mod 8) and Mosaic cannot
        # concatenate mismatched offsets; slices LOADED from a ref
        # materialize at offset 0.
        pscr[...] = pos17g
        pos17 = jnp.concatenate(
            [pscr[r:r + 1, :] for r in range(NCHUNK)], axis=1
        )

        if "route" in ablate:
            val = (pos17 & 255).astype(jnp.float32)
        else:
            # ---- 3-pack one-hot routing (lane-aligned slots) ----
            page = pos17 >> 8
            qc = pos17 & 255
            slots_p = [
                page[:, 0:COLS], page[:, COLS:2 * COLS],
                _pad_cols(page[:, 2 * COLS:SUB], COLS, -1),
            ]
            slots_q = [
                qc[:, 0:COLS], qc[:, COLS:2 * COLS],
                _pad_cols(qc[:, 2 * COLS:SUB], COLS, 0),
            ]
            pa, pb, pc = slots_p
            cb2 = jnp.logical_and(pb == pa, pb >= 0)
            cc_a = jnp.logical_and(pc == pa, pc >= 0)
            cc_b = jnp.logical_and(
                jnp.logical_and(pc == pb, pc >= 0),
                jnp.logical_not(cc_a))
            pb_eff = jnp.where(cb2, -2, pb)
            pc_eff = jnp.where(jnp.logical_or(cc_a, cc_b), -2, pc)
            iota_p = jax.lax.broadcasted_iota(
                jnp.int32, (kpages, COLS), 0)
            # int-composed one-hot with a single bf16 convert: 8.5%
            # whole-kernel win over three bf16 converts + scaled adds
            # (interleaved A/B).  Exact: pb_eff/pc_eff demote page
            # collisions, so element values are {0,1,256,65536} — all
            # bf16-representable.
            ohp = (
                jnp.where(iota_p == pa, 1, 0)
                + jnp.where(iota_p == pb_eff, 256, 0)
                + jnp.where(iota_p == pc_eff, 65536, 0)
            ).astype(jnp.bfloat16)
            yT = jax.lax.dot_general(
                kmat[...], ohp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # (ROWB, COLS)
            yi = yT.astype(jnp.int32)
            iota_r = jax.lax.broadcasted_iota(
                jnp.int32, (ROWB, COLS), 0)
            if "nosel" in ablate:      # timing probe only: wrong bytes
                sels = [yi[:1, :] + q for q in slots_q]
            else:
                sels = [
                    jnp.sum(jnp.where(iota_r == q, yi, 0), axis=0,
                            keepdims=True)
                    for q in slots_q
                ]
            g0 = sels[0] & 255
            g1 = jnp.where(cb2, sels[1] & 255, (sels[1] >> 8) & 255)
            g2 = jnp.where(cc_a, sels[2] & 255,
                           jnp.where(cc_b, (sels[2] >> 8) & 255,
                                     sels[2] >> 16))
            val = jnp.concatenate(
                [g0, g1, g2[:, :SUB - 2 * COLS]], axis=1
            ).astype(jnp.float32)                # (1, SUB)

        # host scal row is (i*8) mod 256; narrow rings wrap at rpages
        # (a power-of-two divisor of 256, so masking recovers it)
        row = scal_ref[i % 8, 0] & (rpages - 1)
        kmat[pl.ds(pl.multiple_of(row, SUB // ROWB), SUB // ROWB), :] = (
            _rows(val, SUB // ROWB).astype(jnp.bfloat16)
        )
        out_ref[...] = _rows(val, SUB // 128).astype(jnp.bfloat16)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            # the carry consumer only needs the FINAL ring; writing it
            # every substep costs 128 KiB/substep of HBM writes
            ring_out_ref[...] = kmat[0:rpages, :]

    return kern


# ---------------------------------------------------------------------------
# Split pipeline: parallel expansion kernel + serial routing kernel.
#
# The fused kernel serializes EVERYTHING behind the ring dependency,
# but only routing needs the ring: a byte's SOURCE POSITION (pos17) is
# a pure function of the sequence records — independent across
# substeps.  Splitting lets Mosaic run expansion as a free-running
# grid (DMA/compute overlapped, no carried scratch) and shrinks the
# serial kernel to window-load + one-hot + routing matmul + select +
# ring update.  Cost: one (NCHUNK, CHUNK) int32 grid (8 KiB/substep)
# written to HBM by expansion and prefetched back by routing — ~20 ns
# of HBM traffic per substep against ~1 us of serial work saved.
# ---------------------------------------------------------------------------

def _make_expand_kernel():
    """Expansion-only kernel: records + patches -> pos17 grid.

    The 2-D prefix sum is FUSED INTO the scatter matmul: instead of a
    one-hot B (scatter deltas, then cum2d's lane-shift log-prefix —
    measured 0.57 us/substep of Mosaic lane shifts), B's columns are
    prefix comparisons.  Byte (r, j)'s field value is the sum of every
    record's delta at a flat position <= r*128+j, i.e.

        sum_k p(k) * [r_k < r]  +  sum_k p(k) * [r_k == r][l_k <= j]

    so A carries both hit matrices ([row==r_k] and [row>r_k], K-dim
    concatenated) and B pairs [lane>=l_k] with an all-ones block.  One
    dot_general then yields the PREFIXED digit planes directly.
    Exactness: per-plane entries are balanced digits |d|<=128 (bf16-
    exact), and a plane's prefix sum is bounded by 576*128 < 2^24, so
    the f32 accumulator is exact."""
    import jax
    import jax.numpy as jnp

    def kern(seqrec_ref, scal_ref, patch_ref, pos_ref):
        i = pl_program_id(0)
        r0 = jnp.concatenate(
            [seqrec_ref[0, 0, r:r + 1, :] for r in range(8)], axis=1
        )
        r1 = jnp.concatenate(
            [seqrec_ref[0, 1, r:r + 1, :] for r in range(8)], axis=1
        )
        live = r0 != 0
        pos12 = r0 & 0xFFF
        planes = [
            ((r0 >> 12) & 255) - 128,
            ((r0 >> 20) & 255) - 128,
            (r1 & 255) - 128,
            ((r1 >> 8) & 255) - 128,
            ((r0 >> 28) & 7) - 4,
            ((r1 >> 16) & 255) - 128,
            ((r1 >> 24) & 255) - 128,
        ]
        r_s = pos12 >> 7
        l_s = pos12 & 127
        iota_r = jax.lax.broadcasted_iota(
            jnp.int32, (NCHUNK, SEQ_MAX), 0)
        hit_eq = (iota_r == r_s).astype(jnp.int32)
        hit_lt = (iota_r > r_s).astype(jnp.int32)
        A = jnp.concatenate(
            [jnp.concatenate(
                [(hit_eq * jnp.where(live, p, 0)).astype(jnp.bfloat16),
                 (hit_lt * jnp.where(live, p, 0)).astype(jnp.bfloat16)],
                axis=1)
             for p in planes], axis=0
        )                                    # (7*NCHUNK, 2*SEQ_MAX)
        lane_ge = (jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, SEQ_MAX), 0) >= l_s).astype(jnp.bfloat16)
        B = jnp.concatenate(
            [lane_ge, jnp.ones((CHUNK, SEQ_MAX), jnp.bfloat16)], axis=1
        )                                    # (CHUNK, 2*SEQ_MAX)
        ps = jax.lax.dot_general(
            A, B, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                  # (7*NCHUNK, CHUNK) PREFIXED
        n = NCHUNK
        U = ps[0:n] + (ps[n:2 * n] << 8) + scal_ref[i % 8, 3]
        V = (ps[2 * n:3 * n] + (ps[3 * n:4 * n] << 8)
             + (ps[4 * n:5 * n] << 16)) + scal_ref[i % 8, 4]
        Bb = (ps[5 * n:6 * n] + (ps[6 * n:7 * n] << 8)
              + scal_ref[i % 8, 5])
        jrow = (jax.lax.broadcasted_iota(
            jnp.int32, (NCHUNK, CHUNK), 0) * CHUNK
            + jax.lax.broadcasted_iota(
                jnp.int32, (NCHUNK, CHUNK), 1))
        pos17g = jnp.where(jrow < Bb, jrow + U + U_BIAS,
                           (jrow + V) & 0xFFFF)
        prec = jnp.concatenate(
            [patch_ref[0, r:r + 1, :] for r in range(8)], axis=1
        )
        ppos = prec >> 18
        code18 = prec & 0x3FFFF
        pr = ppos >> 7
        phit = (jax.lax.broadcasted_iota(
            jnp.int32, (NCHUNK, PATCH_MAX), 0) == pr
        ).astype(jnp.int32)
        pplanes = [code18 & 255, (code18 >> 8) & 255, code18 >> 16]
        pA = jnp.concatenate(
            [(phit * p).astype(jnp.bfloat16) for p in pplanes], axis=0,
        )
        pB = (jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, PATCH_MAX), 0) == (ppos & 127)
        ).astype(jnp.bfloat16)
        psum = jax.lax.dot_general(
            pA, pB, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        pv = (psum[0:NCHUNK] + (psum[NCHUNK:2 * NCHUNK] << 8)
              + (psum[2 * NCHUNK:] << 16))
        pos_ref[...] = jnp.where(pv >= TAG, pv - TAG, pos17g)

    return kern


def pl_program_id(axis):
    from jax.experimental import pallas as pl

    return pl.program_id(axis)


def _make_route_kernel():
    """Routing-only kernel: pos17 grid + ring + literal windows ->
    bytes (the serial stage; same math as the fused kernel's routing
    phase, cf. lib/lz4ada.adb:845-904 for the ring semantics)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def _rows(v, nrows):
        w = v.shape[1] // nrows
        return jnp.concatenate(
            [v[:, r * w:(r + 1) * w] for r in range(nrows)], axis=0
        )

    def _pad_cols(v, width, fill):
        pad = jnp.full((1, width - v.shape[1]), fill, v.dtype)
        return jnp.concatenate([v, pad], axis=1)

    def kern(wq_ref, pos_ref, lit_ref, scal_ref, ring_in_ref,
             out_ref, ring_out_ref, kmat):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            kmat[0:RPAGES, :] = ring_in_ref[...]

        @pl.when((i == 0) | (scal_ref[i % 8, 6] != 0))
        def _():
            wo = scal_ref[i % 8, 1]
            win = lit_ref[0, pl.ds(pl.multiple_of(wo, 8), WPAGES), :]
            kmat[RPAGES:KPAGES, :] = win.astype(jnp.int32).astype(
                jnp.bfloat16)

        pos17 = jnp.concatenate(
            [pos_ref[r:r + 1, :] for r in range(NCHUNK)], axis=1
        )
        page = pos17 >> 8
        qc = pos17 & 255
        slots_p = [
            page[:, 0:COLS], page[:, COLS:2 * COLS],
            _pad_cols(page[:, 2 * COLS:SUB], COLS, -1),
        ]
        slots_q = [
            qc[:, 0:COLS], qc[:, COLS:2 * COLS],
            _pad_cols(qc[:, 2 * COLS:SUB], COLS, 0),
        ]
        pa, pb, pc = slots_p
        cb2 = jnp.logical_and(pb == pa, pb >= 0)
        cc_a = jnp.logical_and(pc == pa, pc >= 0)
        cc_b = jnp.logical_and(
            jnp.logical_and(pc == pb, pc >= 0),
            jnp.logical_not(cc_a))
        pb_eff = jnp.where(cb2, -2, pb)
        pc_eff = jnp.where(jnp.logical_or(cc_a, cc_b), -2, pc)
        iota_p = jax.lax.broadcasted_iota(
            jnp.int32, (KPAGES, COLS), 0)
        ohp = (
            jnp.where(iota_p == pa, 1, 0)
            + jnp.where(iota_p == pb_eff, 256, 0)
            + jnp.where(iota_p == pc_eff, 65536, 0)
        ).astype(jnp.bfloat16)
        yT = jax.lax.dot_general(
            kmat[...], ohp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        yi = yT.astype(jnp.int32)
        iota_r = jax.lax.broadcasted_iota(
            jnp.int32, (ROWB, COLS), 0)
        sels = [
            jnp.sum(jnp.where(iota_r == q, yi, 0), axis=0,
                    keepdims=True)
            for q in slots_q
        ]
        g0 = sels[0] & 255
        g1 = jnp.where(cb2, sels[1] & 255, (sels[1] >> 8) & 255)
        g2 = jnp.where(cc_a, sels[2] & 255,
                       jnp.where(cc_b, (sels[2] >> 8) & 255,
                                 sels[2] >> 16))
        val = jnp.concatenate(
            [g0, g1, g2[:, :SUB - 2 * COLS]], axis=1
        ).astype(jnp.float32)

        row = scal_ref[i % 8, 0]
        kmat[pl.ds(pl.multiple_of(row, SUB // ROWB), SUB // ROWB), :] = (
            _rows(val, SUB // ROWB).astype(jnp.bfloat16)
        )
        out_ref[...] = _rows(val, SUB // 128).astype(jnp.bfloat16)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            ring_out_ref[...] = kmat[0:RPAGES, :]

    return kern


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n_sub", "interpret"),
)
def _decode_split_device(seqrec, lits, winq, scal, patch,
                         ring_init=None, *, n_sub, interpret=False):
    """Two-kernel decode: parallel expansion, then serial routing."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if ring_init is None:
        ring_init = jnp.zeros((RPAGES, ROWB), jnp.bfloat16)
    if n_sub % 8:
        pad = 8 - n_sub % 8
        scal = jnp.concatenate([scal, jnp.zeros((pad, 8), jnp.int32)])

    pos = pl.pallas_call(
        _make_expand_kernel(),
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec((1, 2, 8, SEQ_MAX // 8),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, PATCH_MAX // 8), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((NCHUNK, CHUNK), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_sub * NCHUNK, CHUNK),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seqrec, scal, patch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec((NCHUNK, CHUNK), lambda i, wq: (i, 0)),
            pl.BlockSpec((1, 32, 256), lambda i, wq: (wq[i], 0, 0)),
            pl.BlockSpec((8, 8), lambda i, wq: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RPAGES, ROWB), lambda i, wq: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((SUB // 128, 128), lambda i, wq: (i, 0)),
            pl.BlockSpec((RPAGES, ROWB), lambda i, wq: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((KPAGES, ROWB), jnp.bfloat16)],
    )
    rows, ring_out = pl.pallas_call(
        _make_route_kernel(),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_sub * SUB // 128, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((RPAGES, ROWB), jnp.bfloat16),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(winq, pos, lits, scal, ring_init)
    return rows.astype(jnp.uint8), ring_out


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n_sub", "interpret", "ablate", "rpages",
                     "seq_rows"),
)
def _decode_fused_device(seqrec, lits, winq, scal, patch,
                         ring_init=None, *,
                         n_sub, interpret=False, ablate=frozenset(),
                         rpages=RPAGES, seq_rows=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert (rpages == RPAGES and seq_rows == 8) or not ablate, (
        "ablation knobs are full-width only"
    )
    if ring_init is None:
        ring_init = jnp.zeros((rpages, ROWB), jnp.bfloat16)
    if n_sub % 8:
        pad = 8 - n_sub % 8
        scal = jnp.concatenate([scal, jnp.zeros((pad, 8), jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec((1, 2, 8, SEQ_MAX // 8),
                         lambda i, wq: (i, 0, 0, 0)),
            pl.BlockSpec((1, 32, 256), lambda i, wq: (wq[i], 0, 0)),
            pl.BlockSpec((8, 8), lambda i, wq: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, PATCH_MAX // 8),
                         lambda i, wq: (i, 0, 0)),
            pl.BlockSpec((rpages, ROWB), lambda i, wq: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((SUB // 128, 128), lambda i, wq: (i, 0)),
            pl.BlockSpec((rpages, ROWB), lambda i, wq: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((rpages + WPAGES, ROWB), jnp.bfloat16),
                        pltpu.VMEM((NCHUNK, CHUNK), jnp.int32)],
    )
    rows, ring_out = pl.pallas_call(
        _make_kernel(ablate, rpages, seq_rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_sub * SUB // 128, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((rpages, ROWB), jnp.bfloat16),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(winq, seqrec, lits, scal, patch, ring_init)
    return rows.astype(jnp.uint8), ring_out


PART_SUBS = 8192       # substeps per launch (32 MiB output)


def fused_rpages(max_off: int) -> int:
    """Smallest power-of-two ring (pages) whose window provably covers
    every match offset of the prep: offsets reach back at most
    max_off + (SUB - 1) bytes from a substep's last byte, and the ring
    excludes the current substep — so rpages*256 >= max_off + SUB."""
    for r in (32, 64, 128):
        if max_off + SUB <= r * 256:
            return r
    return RPAGES


def fused_seqrows(max_recs: int) -> int:
    """Smallest record-row count whose slot prefix provably holds every
    substep's live records (slots fill row-major from 0; see
    _make_kernel's seq_rows)."""
    for r in (4, 6):
        if max_recs <= r * (SEQ_MAX // 8):
            return r
    return 8


def decode_fused_rows_on_device(prep: FusedPrep, interpret: bool = False,
                                ring_init=None,
                                part_subs: int | None = None):
    """Decode a FusedPrep on device; returns flat uint8 rows as a device
    array (n_sub * SUB,).

    Chains beyond ``part_subs`` substeps split at substep boundaries
    across launches, each seeding its ring with the previous part's
    final 64 KiB (the device analog of the reference's retained
    history across Update calls, lz4ada.adb:678-680) — the same
    part-wise bound the host-pack engine uses (mxu2.PART_SUBS)."""
    import jax.numpy as jnp

    if prep.n_sub == 0:
        return jnp.zeros(0, jnp.uint8)
    rp = fused_rpages(prep.max_off)
    sq = fused_seqrows(prep.max_recs)
    part = part_subs or PART_SUBS
    if prep.n_sub <= part:
        rows, _ring = _decode_fused_device(
            jnp.asarray(prep.seqrec), jnp.asarray(prep.lits),
            jnp.asarray(prep.winq), jnp.asarray(prep.scal),
            jnp.asarray(prep.patch),
            ring_init, n_sub=prep.n_sub, interpret=interpret,
            rpages=rp, seq_rows=sq,
        )
        return rows.reshape(-1)
    lits_dev = jnp.asarray(prep.lits)
    parts = []
    ring = ring_init
    for p0 in range(0, prep.n_sub, part):
        p1 = min(p0 + part, prep.n_sub)
        rows, ring = _decode_fused_device(
            jnp.asarray(prep.seqrec[p0:p1]), lits_dev,
            jnp.asarray(prep.winq[p0:p1]),
            jnp.asarray(prep.scal[p0:p1]),
            jnp.asarray(prep.patch[p0:p1]),
            ring, n_sub=p1 - p0, interpret=interpret,
            rpages=rp, seq_rows=sq,
        )
        parts.append(rows.reshape(-1))
    return jnp.concatenate(parts)


PIPE_SUBS = 64         # pipelined-chunk substeps (128 KiB output)


def decode_fused_pipelined(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    lit_src: np.ndarray,
    buf: np.ndarray,
    pre: tuple,
    interpret: bool = False,
    pipe_subs: int = PIPE_SUBS,
    counters: dict | None = None,
):
    """Single-chain decode with host prep PIPELINED against device
    execution (round-4 verdict next-#2): the chain is cut into
    ``pipe_subs``-substep chunks; each chunk's prep runs through the
    native RANGE prep (lz4core.cpp lz4tpu_prep_fused_pre_range) and
    dispatches immediately — JAX dispatch is asynchronous, so the host
    preps chunk k+1 while the device decodes chunk k.  Rings chain on
    device between launches (the part-split scheme), so no boundary
    resolution happens at all.

    Every launch shares ONE compiled program: all chunks are exactly
    ``pipe_subs`` substeps (the tail chunk is padded with zeroed prep
    content — zero records scatter nothing, zeroed scalars route into
    in-range pages, and the padded rows are sliced off), and the
    kernel variant (rpages/seq_rows) is fixed up front from the scan's
    max_off and the exact per-substep record-count bound.

    ``pre`` is the scan_block_full tuple (single-chain streams).
    Requires the native engine.  Returns (flat_rows_device, n_out);
    raises FusedOverflow on any budget overflow.

    ``counters``: optional dict instrumented for tests —
    ``chunks`` (list of (i_lo, i_hi)), ``prep_done_t`` /
    ``dispatch_t`` (monotonic stamps per chunk).
    """
    import time as _time

    import jax.numpy as jnp

    from .. import native

    if not native.available():
        raise FusedOverflow("pipelined decode requires the native engine")
    starts_ext, litpos_ext, lits_flat, max_off = pre
    S = lit_len.size
    n_out = int(starts_ext[S]) if S else 0
    n_lit = int(litpos_ext[S]) if S else 0
    n_sub = -(-n_out // SUB) if n_out else 0
    if n_sub == 0:
        return jnp.zeros(0, jnp.uint8), 0
    n_win = max(1, -(-max(1, n_lit) // LITWIN_Q))
    n_pad = -(-n_sub // pipe_subs) * pipe_subs
    _, winq, scal, seqrec, patch, hw = _pool_arrays(n_pad, 1)
    if n_pad > n_sub:
        # the tail chunk decodes zeroed substeps (pool buffers come
        # back dirty); their rows are sliced off
        winq[n_sub:] = 0
        scal[n_sub:] = 0
        seqrec[n_sub:] = 0
        patch[n_sub:] = 0
        hw[n_sub:] = 0
    lits_dev = jnp.asarray(_build_windows(lits_flat[:n_lit], n_win))
    rp = fused_rpages(int(max_off))
    # exact per-substep record-count bound: records are the producing
    # sequences starting in a substep
    sizes = lit_len.astype(np.int64) + match_len
    prod = np.where(sizes > 0)[0]
    max_recs = (int(np.bincount(
        starts_ext[prod] // SUB, minlength=1).max()) if prod.size else 0)
    if max_recs > SEQ_MAX:
        raise FusedOverflow(
            f"{max_recs} seq records per substep (budget {SEQ_MAX})"
        )
    sq = fused_seqrows(max_recs)
    ll32 = np.ascontiguousarray(lit_len, np.int32)
    ml32 = np.ascontiguousarray(match_len, np.int32)
    mo32 = np.ascontiguousarray(match_off, np.int32)
    ls32 = np.ascontiguousarray(lit_src, np.int32)
    buf8 = np.ascontiguousarray(buf, np.uint8)
    parts = []
    ring = None
    for i_lo in range(0, n_sub, pipe_subs):
        i_hi = min(i_lo + pipe_subs, n_sub)
        try:
            native.prep_fused_pre_range(
                ll32, ml32, mo32, ls32, buf8, n_win,
                starts_ext, litpos_ext, lits_flat, n_out,
                i_lo, i_hi, winq, scal, seqrec, patch, hw,
            )
        except ValueError as exc:
            raise FusedOverflow(str(exc)) from None
        if counters is not None:
            counters.setdefault("chunks", []).append((i_lo, i_hi))
            counters.setdefault("prep_done_t", []).append(
                _time.monotonic())
        rows, ring = _decode_fused_device(
            jnp.asarray(seqrec[i_lo:i_lo + pipe_subs]), lits_dev,
            jnp.asarray(winq[i_lo:i_lo + pipe_subs]),
            jnp.asarray(scal[i_lo:i_lo + pipe_subs]),
            jnp.asarray(patch[i_lo:i_lo + pipe_subs]),
            ring, n_sub=pipe_subs, interpret=interpret,
            rpages=rp, seq_rows=sq,
        )
        if counters is not None:
            counters.setdefault("dispatch_t", []).append(
                _time.monotonic())
        parts.append(rows.reshape(-1))
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return flat, n_out


def decode_fused(prep: FusedPrep, interpret: bool = False) -> list:
    """Decode a FusedPrep on device; returns [(chain_id, bytes)]."""
    import jax

    flat = np.asarray(jax.device_get(
        decode_fused_rows_on_device(prep, interpret)
    ))
    return [
        (cid, flat[slo * SUB: slo * SUB + n_out].tobytes())
        for (cid, slo, _shi, n_out) in prep.out_spans
    ]
