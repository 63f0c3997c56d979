"""Fused on-device LZ4 decode: sequence expansion + provenance routing
in ONE Pallas kernel — host work is O(sequences), not O(output bytes).

Round 1's dense engine (device/mxu2.py) resolved every output byte's
provenance on the HOST (native pack, ~4 ns/byte) and shipped a 4 B/byte
code array to the device; sustained end-to-end throughput was therefore
host-bound (round-1 verdict, weakness #2).  This engine moves the
per-byte work on-device; the host ships only O(S) sequence records plus
O(in-substep bytes) patch records (~2-6 % of output for text).

Per 4096-byte substep the kernel:

1. **Expands** the sequence table to per-byte fields with sublane
   masked sums: the seq table lives in HBM as overlapped lane-column
   blocks (seq s -> row s%128 [+64 duplicated rows so 48-row windows
   never wrap], lane column s//128; blocks of 32 columns at 16-column
   stride so the per-substep window always fits).  Each 128-byte chunk
   dynamically slices the 48 sublanes around its host-computed anchor
   seq and reduces (start <= j < next_start) indicators against the
   field vectors.  XLA-level gathers measure ~13 ns/element on v5e
   (three orders of magnitude too slow) — masked sums ARE the TPU
   gather.
2. Derives each byte's **source position**: literal bytes point into a
   24-page window of the literal stream (appended to the routing
   matmul's page space), match bytes point into the 64 KiB ring
   (reference semantics: lib/lz4ada.adb:845-904).  No byte values are
   ever touched on the host — literals route through the same matmul
   as history bytes.
3. Applies **patches** for bytes whose source lies in the *current*
   substep (the ring does not hold them yet): the host resolves those
   chains (measured depth <= 6 on t1111k) and the kernel scatters the
   resolved positions with ONE stacked-plane bf16 outer-product matmul
   ([row==r_k] x [lane==l_k] with three 8-bit value planes — bf16
   integers are exact to 256).
4. **Routes** all 4096 bytes from the [ring | literal window] page
   space with one 3-packed one-hot bf16 matmul (weights {1,256,65536};
   sums <= 255*(1+256+65536) < 2^24 stay exact in the f32 accumulator —
   the f32-mantissa bound that makes 3 bytes/column the FLOP floor),
   then selects within pages directly on the raw routed matrix (one
   masked sum per pack slot) and splits the three 8-bit fields on the
   (1, cols) results.

The routing matrix is a (280, 256) persistent scratch: rows 0..255 the
64 KiB history ring (written wrap-free — 16 rows/substep divides 256),
rows 256..279 the per-substep literal window (refreshed each substep;
window start slack <= 2047 B + consumed literals <= 4096 B < 24 pages,
a hard bound).  Chains exceeding a budget (PATCH_MAX in-substep bytes
per substep, >4096 sequences per substep window) raise FusedOverflow
and fall back to the host-pack engine.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

SUB = 4096                 # output bytes per substep
ROWB = 256                 # ring row bytes
RPAGES = 256               # 64 KiB ring pages
WPAGES = 24                # literal window pages (6 KiB)
KPAGES = RPAGES + WPAGES   # routed page space (280)
PACK = 3                   # bytes per matmul column
COLS = 1408                # matmul columns (lane-aligned slot stride;
                           # slots cover bytes [0,1408),[1408,2816),
                           # [2816,4096) — the third is short)
CHUNK = 128
NCHUNK = SUB // CHUNK      # 32
SEQROWS = 192              # 128 rows + 64 duplicated from the next col
SEQBLK = 32                # seq-block lane columns (stride 16)
SEQSTRIDE = 16
PATCH_MAX = 768            # in-substep patch budget per substep
LITWIN_Q = 4096            # literal window stride (bytes; blocks 8 KiB)
TAG = 1 << 17              # patch marker above the 17-bit position space
SENTINEL = (1 << 31) - 1


@dataclasses.dataclass
class FusedPrep:
    """Device-ready inputs for the fused kernel (one or more chains)."""

    seqblk: np.ndarray     # int32 (n_blk, 4, SEQROWS, SEQBLK) fields:
                           #   0=start 1=lit_len 2=match_off 3=litpos
    lits: np.ndarray       # uint8 (n_win, 32, 256) overlapped windows
    colbase: np.ndarray    # int32 [n_sub] seq block index
    winq: np.ndarray       # int32 [n_sub] literal window index
    scal: np.ndarray       # int32 [n_sub, 4]: ring row, sub_base, wo, wabs
    anchors: np.ndarray    # int32 [n_sub, NCHUNK] chunk anchor (block-rel)
    patch: np.ndarray      # int32 [n_sub, 8, PATCH_MAX//8] records
    patch_t: np.ndarray    # int32 [n_sub, PATCH_MAX//8, 8] transposed
    n_sub: int
    n_patches: int
    out_spans: list        # [(chain_id, sub_lo, sub_hi, out_len)]


class FusedOverflow(Exception):
    """Chain exceeds a fused-kernel budget; caller falls back to the
    host-pack engine (device/mxu2.py)."""


def _first_seq(starts: np.ndarray, positions) -> np.ndarray:
    """Index of the sequence owning each output position."""
    return np.maximum(
        np.searchsorted(starts, positions, side="right") - 1, 0
    ).astype(np.int64)


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


def prep_fused(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    lit_src: np.ndarray,
    buf: np.ndarray,
    chain_ranges: list | None = None,
) -> FusedPrep:
    """Build fused-kernel inputs from sequence-table ranges.

    All work is O(S + n_sub + in-substep bytes); no per-output-byte
    pass exists (that is the point — cf. module docstring).  Raises
    FusedOverflow for chains that exceed a kernel budget."""
    if chain_ranges is None:
        chain_ranges = [(0, lit_len.size)]

    # ---- pass 1: per-chain metadata ---------------------------------
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

    # ---- pass 2: per-substep records + patches ----------------------
    scal = np.zeros((max(n_sub_total, 1), 4), np.int32)
    colbase = np.zeros(max(n_sub_total, 1), np.int32)
    winq = np.zeros(max(n_sub_total, 1), np.int32)
    anchors = np.zeros((max(n_sub_total, 1), NCHUNK), np.int32)
    all_sub_i, all_rec = [], []
    fstart_cols, fll_cols, fmo_cols, flit_cols = [], [], [], []
    out_spans = []
    col_off = 0
    for m in chain_meta:
        cid, sub0, n_sub_c = m["cid"], m["sub0"], m["n_sub"]
        out_spans.append((cid, sub0, sub0 + n_sub_c, m["n_out"]))
        if n_sub_c == 0:
            continue
        starts, ll, mo, litpos = (m["starts"], m["ll"], m["mo"],
                                  m["litpos"])
        S = ll.size
        n_out = m["n_out"]
        # padded per-seq vectors with two sentinel rows (so the
        # next-start shift and ownership of the pad tail are defined)
        pst = np.concatenate([starts[:-1], [n_out], [np.int64(SENTINEL)]])
        pll = np.concatenate([ll, [0, 0]])
        pmo = np.concatenate([mo, [1, 1]])
        pli = np.concatenate([litpos[:-1], [litpos[-1], litpos[-1]]])

        # lane-column layout of this chain's seqs
        cols_c = -(-(S + 2) // 128)
        def col_layout(vec, pad):
            padv = np.full(cols_c * 128, pad, np.int64)
            padv[: vec.size] = vec
            return padv.reshape(cols_c, 128).T       # (128, cols_c)
        fstart_cols.append(col_layout(pst, SENTINEL))
        fll_cols.append(col_layout(pll, 0))
        fmo_cols.append(col_layout(pmo, 1))
        flit_cols.append(col_layout(pli, pli[-1]))

        sub_ids = np.arange(n_sub_c, dtype=np.int64)
        sub_starts = sub_ids * SUB
        s0 = _first_seq(pst, sub_starts)
        blk = (col_off + s0 // 128) // SEQSTRIDE
        colbase[sub0:sub0 + n_sub_c] = blk
        blk_first_seq = (blk * SEQSTRIDE - col_off) * 128

        cpos = (sub_starts[:, None]
                + np.arange(NCHUNK, dtype=np.int64)[None, :] * CHUNK)
        a = _first_seq(pst, cpos.reshape(-1)).reshape(n_sub_c, NCHUNK)
        a_rel = a - blk_first_seq[:, None]
        if a_rel.size and (a_rel.min() < 0
                           or a_rel.max() >= SEQBLK * 128 - 64):
            raise FusedOverflow("seq window overflow")
        anchors[sub0:sub0 + n_sub_c] = a_rel.astype(np.int32)

        # literal window per substep
        local0 = sub_starts - pst[s0]
        consumed = pli[s0] + np.minimum(np.maximum(local0, 0), pll[s0])
        wq = np.minimum(consumed // LITWIN_Q, n_win - 1)
        wo = ((consumed - wq * LITWIN_Q) >> 8) & ~np.int64(7)
        wabs = wq * (LITWIN_Q >> 8) + wo
        winq[sub0:sub0 + n_sub_c] = wq
        scal[sub0:sub0 + n_sub_c, 0] = (sub_ids * (SUB // ROWB)) % RPAGES
        scal[sub0:sub0 + n_sub_c, 1] = sub_starts
        scal[sub0:sub0 + n_sub_c, 2] = wo
        scal[sub0:sub0 + n_sub_c, 3] = wabs

        # ---- in-substep patches (vectorized over sequences) ---------
        m0 = pst[:S] + ll              # match span start per seq
        m1 = pst[1:S + 1]              # match span end (= next start)
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
            wb = wabs[sub_i] << 8
            lit_rel = (-res - 1) - wb
            is_l = res < 0
            if is_l.any() and (lit_rel[is_l].min() < 0
                               or lit_rel[is_l].max() >= WPAGES * 256):
                raise FusedOverflow("patch literal outside window")
            pos17 = np.where(is_l, 65536 + lit_rel, res)
            rec = ((pos - sub_i * SUB) << 18) | pos17 | TAG
            all_sub_i.append(sub0 + sub_i)
            all_rec.append(rec)

        col_off += cols_c
        col_off = -(-col_off // SEQSTRIDE) * SEQSTRIDE

    # ---- assemble global column arrays + overlapped blocks ----------
    C = -(-max(col_off, SEQSTRIDE) // SEQSTRIDE) * SEQSTRIDE + SEQSTRIDE
    def assemble(cols_list, pad):
        g = np.full((SEQROWS, C), pad, np.int64)
        off = 0
        for block in cols_list:
            cc = block.shape[1]
            g[:128, off:off + cc] = block
            if cc > 1:
                g[128:, off:off + cc - 1] = block[:64, 1:]
            g[128:, off + cc - 1] = pad
            off += cc
            off = -(-off // SEQSTRIDE) * SEQSTRIDE
        return g
    f_start = assemble(fstart_cols, SENTINEL)
    f_ll = assemble(fll_cols, 0)
    f_mo = assemble(fmo_cols, 1)
    f_lit = assemble(flit_cols, 0)
    n_blk = C // SEQSTRIDE - 1
    seqblk = np.zeros((max(n_blk, 1), 4, SEQROWS, SEQBLK), np.int32)
    for b in range(n_blk):
        sl = slice(b * SEQSTRIDE, b * SEQSTRIDE + SEQBLK)
        seqblk[b, 0] = np.minimum(f_start[:, sl], SENTINEL)
        seqblk[b, 1] = np.minimum(f_ll[:, sl], SENTINEL)
        seqblk[b, 2] = f_mo[:, sl]
        seqblk[b, 3] = np.minimum(f_lit[:, sl], SENTINEL)

    # literal stream as overlapped 8 KiB windows at 4 KiB stride
    lit_pad = np.zeros(n_win * LITWIN_Q + LITWIN_Q, np.uint8)
    lit_pad[: lits_flat.size] = lits_flat
    wins = np.zeros((n_win, 32, 256), np.uint8)
    for w in range(n_win):
        wins[w] = lit_pad[w * LITWIN_Q: w * LITWIN_Q + 8192].reshape(
            32, 256
        )

    # patch blocks (grouped per substep)
    patch = np.zeros((max(n_sub_total, 1), 8, PATCH_MAX // 8), np.int32)
    n_patches = 0
    if all_rec:
        sub_i = np.concatenate(all_sub_i)
        rec = np.concatenate(all_rec).astype(np.int64)
        n_patches = rec.size
        counts = np.bincount(sub_i, minlength=n_sub_total)
        if counts.max() > PATCH_MAX:
            raise FusedOverflow(
                f"{int(counts.max())} in-substep patches "
                f"(budget {PATCH_MAX})"
            )
        order = np.argsort(sub_i, kind="stable")
        slot = np.arange(n_patches) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        flat = np.zeros((max(n_sub_total, 1), PATCH_MAX), np.int64)
        flat[sub_i[order], slot] = rec[order]
        patch = flat.reshape(-1, 8, PATCH_MAX // 8).astype(np.uint32) \
                    .view(np.int32)
    patch_t = np.ascontiguousarray(patch.transpose(0, 2, 1))

    return FusedPrep(
        seqblk=seqblk, lits=wins,
        colbase=colbase[:max(n_sub_total, 1)],
        winq=winq, scal=scal, anchors=anchors,
        patch=patch, patch_t=patch_t,
        n_sub=n_sub_total, n_patches=n_patches, out_spans=out_spans,
    )


# ---------------------------------------------------------------------------
# numpy golden model of the kernel semantics (tests compare both ways:
# golden vs host engine, and Pallas kernel vs golden)
# ---------------------------------------------------------------------------

def golden_decode(prep: FusedPrep) -> np.ndarray:
    """Reference implementation of the kernel's per-substep math —
    identical field expansion, patch override and source-position
    semantics; byte values are read directly instead of via matmul."""
    ring = np.zeros(65536, np.uint8)
    lit_flat = np.zeros((prep.lits.shape[0] + 1) * LITWIN_Q, np.uint8)
    for w in range(prep.lits.shape[0]):
        lit_flat[w * LITWIN_Q: w * LITWIN_Q + 8192] = (
            prep.lits[w].reshape(-1)
        )
    out = np.zeros(prep.n_sub * SUB, np.uint8)
    chain_start = {slo for (_c, slo, shi, _n) in prep.out_spans
                   if shi > slo}
    for i in range(prep.n_sub):
        if i in chain_start:
            ring[:] = 0
        sub_base = int(prep.scal[i, 1])
        wabs = int(prep.scal[i, 3])
        win = lit_flat[wabs * 256: wabs * 256 + WPAGES * 256]
        pv = np.zeros(SUB, np.int64)
        recs = prep.patch[i].reshape(-1).view(np.uint32).astype(np.int64)
        for r in recs[recs != 0]:
            pv[int(r) >> 18] = int(r) & 0x3FFFF
        cb = int(prep.colbase[i])
        pos17 = np.zeros(SUB, np.int64)
        for c in range(NCHUNK):
            a_rel = int(prep.anchors[i, c])
            lane = a_rel >> 7
            rs = (a_rel & 127) & ~7
            rows = slice(rs, rs + 48)
            st = prep.seqblk[cb, 0, rows, lane].astype(np.int64)
            llv = prep.seqblk[cb, 1, rows, lane].astype(np.int64)
            mov = prep.seqblk[cb, 2, rows, lane].astype(np.int64)
            liv = prep.seqblk[cb, 3, rows, lane].astype(np.int64)
            nxt = np.concatenate([st[1:], [SENTINEL]])
            jj = sub_base + c * CHUNK + np.arange(CHUNK, dtype=np.int64)
            ind = ((st[:, None] <= jj[None, :])
                   & (nxt[:, None] > jj[None, :])).astype(np.int64)
            s_f = (ind * st[:, None]).sum(0)
            l_f = (ind * llv[:, None]).sum(0)
            m_f = (ind * mov[:, None]).sum(0)
            li_f = (ind * liv[:, None]).sum(0)
            local = jj - s_f
            is_lit = local < l_f
            ringp = (jj - m_f) & 0xFFFF
            winp = 65536 + (li_f + local - (wabs << 8))
            p17 = np.where(is_lit, winp, ringp)
            pvc = pv[c * CHUNK:(c + 1) * CHUNK]
            p17 = np.where(pvc >= TAG, pvc - TAG, p17)
            pos17[c * CHUNK:(c + 1) * CHUNK] = p17
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

def _make_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

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

    def kern(cb_ref, wq_ref, seq_ref, lit_ref, scal_ref, anch_ref,
             patch_ref, ring_in_ref,
             out_ref, ring_out_ref, kmat):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            kmat[0:RPAGES, :] = ring_in_ref[...]

        sub_base = scal_ref[i % 8, 1]
        wo = scal_ref[i % 8, 2]
        wabs = scal_ref[i % 8, 3]

        # literal window pages -> routing rows 256..279 (u8 -> i32 ->
        # bf16: Mosaic has no direct u8->bf16 cast)
        win = lit_ref[0, pl.ds(pl.multiple_of(wo, 8), WPAGES), :]
        kmat[RPAGES:KPAGES, :] = win.astype(jnp.int32).astype(jnp.bfloat16)

        # ---- patch scatter: one stacked-plane bf16 outer product ----
        prec = jnp.concatenate(
            [patch_ref[0, r:r + 1, :] for r in range(8)], axis=1
        )                                        # (1, PATCH_MAX)
        pos12 = prec >> 18                       # records are < 2^31
        code18 = prec & 0x3FFFF
        r_k = pos12 >> 7
        hit = (jax.lax.broadcasted_iota(
            jnp.int32, (NCHUNK, PATCH_MAX), 0) == r_k).astype(jnp.int32)
        planes = [code18 & 255, (code18 >> 8) & 255, code18 >> 16]
        A = jnp.concatenate(
            [(hit * p).astype(jnp.bfloat16) for p in planes], axis=0
        )                                        # (3*NCHUNK, PATCH_MAX)
        # lane-major one-hot of the patch lanes; the MXU contracts the
        # patch dimension on BOTH operands (no transpose materialized)
        l_k = pos12 & 127                        # (1, PATCH_MAX)
        B = (jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, PATCH_MAX), 0) == l_k).astype(jnp.bfloat16)
        psum = jax.lax.dot_general(
            A, B, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                      # (3*NCHUNK, 128)
        pv = (psum[0:NCHUNK] + (psum[NCHUNK:2 * NCHUNK] << 8)
              + (psum[2 * NCHUNK:] << 16))       # (NCHUNK, 128)

        # ---- expansion: per-chunk sublane masked sums ----
        iota_lane = jax.lax.broadcasted_iota(
            jnp.int32, (48, SEQBLK), 1)
        iota_chunk = jax.lax.broadcasted_iota(
            jnp.int32, (NCHUNK, CHUNK), 0)
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        pos_parts = []
        for c in range(NCHUNK):
            a_rel = anch_ref[i % 8, c]
            lane = a_rel >> 7
            rs = (a_rel & 127) & ~7
            lane_m = iota_lane == lane
            fld = []
            for f in range(4):
                blk = seq_ref[0, f, pl.ds(pl.multiple_of(rs, 8), 48), :]
                fld.append(jnp.sum(
                    jnp.where(lane_m, blk, 0), axis=1, keepdims=True
                ))                               # (48, 1)
            st, llv, mov, liv = fld
            nxt = jnp.concatenate(
                [st[1:], jnp.full((1, 1), SENTINEL, jnp.int32)], axis=0
            )
            jj = sub_base + c * CHUNK + iota128  # (1, 128)
            ind = jnp.logical_and(st <= jj, nxt > jj)
            s_f = jnp.sum(jnp.where(ind, st, 0), axis=0, keepdims=True)
            l_f = jnp.sum(jnp.where(ind, llv, 0), axis=0, keepdims=True)
            m_f = jnp.sum(jnp.where(ind, mov, 0), axis=0, keepdims=True)
            li_f = jnp.sum(jnp.where(ind, liv, 0), axis=0, keepdims=True)
            local = jj - s_f
            ringp = (jj - m_f) & 0xFFFF
            winp = 65536 + (li_f + local - (wabs << 8))
            p17 = jnp.where(local < l_f, winp, ringp)
            # extract patch row c with a masked sum (NOT pv[c:c+1] — a
            # sublane slice would give the 32 chunk results 32 distinct
            # sublane offsets, which Mosaic cannot re-concatenate)
            pvc = jnp.sum(
                jnp.where(iota_chunk == c, pv, 0), axis=0, keepdims=True
            )
            p17 = jnp.where(pvc >= TAG, pvc - TAG, p17)
            pos_parts.append(p17)
        pos17 = jnp.concatenate(pos_parts, axis=1)   # (1, SUB)

        # ---- 3-pack one-hot routing (lane-aligned slot stride) ----
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
        cc_b = jnp.logical_and(jnp.logical_and(pc == pb, pc >= 0),
                               jnp.logical_not(cc_a))
        pb_eff = jnp.where(cb2, -2, pb)
        pc_eff = jnp.where(jnp.logical_or(cc_a, cc_b), -2, pc)
        iota_p = jax.lax.broadcasted_iota(
            jnp.int32, (KPAGES, COLS), 0)
        ohp = (
            (iota_p == pa).astype(jnp.bfloat16)
            + (iota_p == pb_eff).astype(jnp.bfloat16) * 256
            + (iota_p == pc_eff).astype(jnp.bfloat16) * 65536
        )
        yT = jax.lax.dot_general(
            kmat[...], ohp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # (ROWB, COLS)
        yi = yT.astype(jnp.int32)
        iota_r = jax.lax.broadcasted_iota(
            jnp.int32, (ROWB, COLS), 0)
        sels = [
            jnp.sum(jnp.where(iota_r == q, yi, 0), axis=0, keepdims=True)
            for q in slots_q
        ]
        g0 = sels[0] & 255
        g1 = jnp.where(cb2, sels[1] & 255, (sels[1] >> 8) & 255)
        g2 = jnp.where(cc_a, sels[2] & 255,
                       jnp.where(cc_b, (sels[2] >> 8) & 255,
                                 sels[2] >> 16))
        val = jnp.concatenate(
            [g0, g1, g2[:, :SUB - 2 * COLS]], axis=1
        ).astype(jnp.float32)                    # (1, SUB)

        row = scal_ref[i % 8, 0]
        kmat[pl.ds(pl.multiple_of(row, SUB // ROWB), SUB // ROWB), :] = (
            _rows(val, SUB // ROWB).astype(jnp.bfloat16)
        )
        out_ref[...] = _rows(val, SUB // 128).astype(jnp.bfloat16)
        ring_out_ref[...] = kmat[0:RPAGES, :]

    return kern


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n_sub", "interpret"),
)
def _decode_fused_device(seqblk, lits, colbase, winq, scal, anchors,
                         patch, ring_init=None, *,
                         n_sub, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if ring_init is None:
        ring_init = jnp.zeros((RPAGES, ROWB), jnp.bfloat16)
    if n_sub % 8:
        pad = 8 - n_sub % 8
        scal = jnp.concatenate(
            [scal, jnp.zeros((pad, 4), jnp.int32)])
        anchors = jnp.concatenate(
            [anchors, jnp.zeros((pad, NCHUNK), jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec((1, 4, SEQROWS, SEQBLK),
                         lambda i, cb, wq: (cb[i], 0, 0, 0)),
            pl.BlockSpec((1, 32, 256),
                         lambda i, cb, wq: (wq[i], 0, 0)),
            pl.BlockSpec((8, 4), lambda i, cb, wq: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, NCHUNK), lambda i, cb, wq: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, PATCH_MAX // 8),
                         lambda i, cb, wq: (i, 0, 0)),
            pl.BlockSpec((RPAGES, ROWB), lambda i, cb, wq: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((SUB // 128, 128), lambda i, cb, wq: (i, 0)),
            pl.BlockSpec((RPAGES, ROWB), lambda i, cb, wq: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((KPAGES, ROWB), jnp.bfloat16)],
    )
    rows, ring_out = pl.pallas_call(
        _make_kernel(),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_sub * SUB // 128, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((RPAGES, ROWB), jnp.bfloat16),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(colbase, winq, seqblk, lits, scal, anchors, patch, ring_init)
    return rows.astype(jnp.uint8), ring_out


def decode_fused_rows_on_device(prep: FusedPrep, interpret: bool = False,
                                ring_init=None):
    """Decode a FusedPrep on device; returns flat uint8 rows as a device
    array (n_sub * SUB,)."""
    import jax.numpy as jnp

    if prep.n_sub == 0:
        return jnp.zeros(0, jnp.uint8)
    rows, _ring = _decode_fused_device(
        jnp.asarray(prep.seqblk), jnp.asarray(prep.lits),
        jnp.asarray(prep.colbase), jnp.asarray(prep.winq),
        jnp.asarray(prep.scal), jnp.asarray(prep.anchors),
        jnp.asarray(prep.patch),
        ring_init, n_sub=prep.n_sub, interpret=interpret,
    )
    return rows.reshape(-1)


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
