"""MXU one-hot routing decoder for dense LZ4 chains.

The reference's hot loop walks sequences one at a time and moves bytes
with scalar wild copies (reference: lib/lz4ada.adb:716-904).  On TPU a
sequential walk is hopeless for text-like data (~5 bytes/sequence at
222K sequences for t1111k), and per-byte XLA gathers run at scalar
speed (~7 ns/element on v5e).  This module instead turns LZ4 decode
into dense linear algebra the MXU can chew:

* Output is produced in fixed SUB-byte substeps.  The host packer
  (`pack_dense`) splits sequences at substep boundaries so every
  substep emits exactly SUB bytes from at most SLOTS slots (literal
  runs / match chunks, each <= 255 bytes), and emits a per-byte
  slot-boundary bitmap (256 bits per substep).

* A VMEM scratch ring holds the last 64 KiB of decoded output as 256
  pages x 256 bytes (the TPU analog of the reference's 64 KiB history
  ring, lz4ada.adb:678-680).  Literal bytes live in a host-extracted
  stream, also VMEM-resident.

* Per substep, every output byte's provenance is computed with vector
  ops on (1, SUB) lane-major rows (skinny sublane columns waste 127 of
  128 VPU lanes), and bytes are routed from ring and literal pages with
  one-hot matmuls contracted on dimension 0 — bytes stay on the lane
  axis end to end.  No gathers, no scatters.

* Intra-substep references are rewritten by the packer into ring or
  literal references (interval chain-following, the pack-time analog of
  the reference's doubling replay, lz4ada.adb:893-903).  When a rewrite
  is impossible (offset < 8 self-overlap, >16-deep chains, composed
  offset > 64 KiB) the pack is flagged and a fix-point kernel variant
  resolves the remaining self-references on device; the fast variant
  counts any unexpected self-references into an output flag the host
  asserts on.

Byte values ride bf16 (integers <= 256 exact) with f32 accumulation;
positions stay int32/f32, exact below 2^24 (enforced by MAX_PART_OUT).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

SUB = 2048          # output bytes per substep
# Slot budget: every LZ4 sequence produces >= 4 bytes (minimum match),
# so 2048 bytes need <= 512 slots; boundary splits and packer rewrites
# add a few more.  640 gives slack at 3.2 bytes/slot.
SLOTS = 640
PAGES = 256         # 64 KiB history ring: 256 pages x 256 bytes
LITROWS = 24        # literal window rows visible per substep
ROWB = 256          # bytes per ring/literal row
MAX_PART_OUT = 4 << 20
_REWRITE_DEPTH = 16
_MIN_SELF_OFF = 8   # below this, self-overlap rewriting explodes; punt


@dataclasses.dataclass
class DensePack:
    """Device-ready packing of one or more dense chains."""

    tbl: np.ndarray        # int32 [n_sub, SLOTS]: ll | ml<<8 | off<<15
                           # (ml is 7 bits <=127; off is 17 bits so
                           # packer rewrites can reach 64KiB+SUB back)
    scal: np.ndarray       # int32 [n_sub, 8]: [local_base, lit_base, ...]
    bmap: np.ndarray       # int32 [n_sub, SUB//32] slot-start bitmap
    lit: np.ndarray        # uint8 [lit_rows * ROWB] literal stream
    n_sub: int
    out_spans: list        # [(chain_id, sub_lo, sub_hi, out_len)]
    has_self: bool         # True -> needs the fix-point kernel variant


class _SubPacker:
    """Packs one chain into SUB-exact substeps, rewriting intra-substep
    match sources into ring/literal references where possible."""

    def __init__(self, lit_stream: bytearray):
        self.lit = lit_stream
        self.tbl_rows: list = []
        self.scal_rows: list = []
        self.bmap_rows: list = []
        self.has_self = False
        self._start()

    def _start(self):
        self.cur: list = []        # packed uint32 slots
        self.meta: list = []       # (dst, ll, ml, off, lit_pos) per slot
        self.fill = 0
        self.litbase = len(self.lit)
        self.cur_self = False      # substep contains punted self slots

    def _end(self):
        assert self.fill == SUB and len(self.cur) <= SLOTS
        row = np.zeros(SLOTS, np.uint32)
        row[: len(self.cur)] = self.cur
        self.tbl_rows.append(row.view(np.int32))
        self.scal_rows.append(
            np.array([0, self.litbase, int(self.cur_self), 0, 0, 0, 0, 0],
                     np.int32)
        )
        bits = np.zeros(SUB, np.uint8)
        bits[[m[0] for m in self.meta]] = 1
        # Layout chosen for the kernel's pltpu.repeat tiling: the flag
        # for output byte j lives in int32 word (j & 63), bit (j >> 6).
        b4 = np.packbits(bits.reshape(32, SUB // 32), axis=0,
                         bitorder="little")          # (4, SUB//32) uint8
        words = (b4[0].astype(np.uint32)
                 | b4[1].astype(np.uint32) << 8
                 | b4[2].astype(np.uint32) << 16
                 | b4[3].astype(np.uint32) << 24)
        self.bmap_rows.append(words.view(np.int32))
        self._start()

    def room(self) -> int:
        return SUB - self.fill

    def _slot(self, ll, ml, off, lit_pos):
        if len(self.cur) >= SLOTS:
            raise OverflowError("slot budget exceeded")
        assert ml <= 127 and off < (1 << 17)
        self.cur.append(
            np.uint32(ll) | np.uint32(ml) << np.uint32(8)
            | np.uint32(off) << np.uint32(15)
        )
        self.meta.append((self.fill, ll, ml, off, lit_pos))
        self.fill += ll + ml
        if self.fill == SUB:
            self._end()

    def push_lit(self, chunk: bytes):
        """Literal run; caller guarantees it fits the current substep."""
        lit_pos = len(self.lit) - self.litbase
        # extend BEFORE _slot: _slot may close the substep, and the new
        # substep's litbase must account for this chunk's bytes
        self.lit.extend(chunk)
        self._slot(len(chunk), 0, 1, lit_pos)

    def _resolve(self, p: int, depth: int = 0):
        """Map substep-local position p to ('ring', neg_local_pos) or
        ('lit', stream_pos), plus the run length over which the mapping
        shifts uniformly.  Returns None to request device-side fixing."""
        if depth > _REWRITE_DEPTH:
            return None
        lo, hi = 0, len(self.meta)
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            if self.meta[mid][0] <= p:
                lo = mid
            else:
                hi = mid
        dst, ll, ml, off, lit_pos = self.meta[lo]
        rel = p - dst
        if rel < ll:
            return ("lit", self.litbase + lit_pos + rel), ll - rel
        rel -= ll
        run = ml - rel
        src = dst + ll - off + rel
        if src < 0:
            return ("ring", src), min(run, -src)
        r = self._resolve(src, depth + 1)
        if r is None:
            return None
        (kind, v), run2 = r
        return (kind, v), min(run, run2)

    def push_match(self, ml: int, off: int):
        """Match run, split into substep/127-byte chunks; intra-substep
        sources rewritten to ring offsets or re-appended literals."""
        while ml > 0:
            take = min(ml, 127, self.room())
            src = self.fill - off
            if src + min(take, off) <= 0:
                # collapsed sources [src, src+min(take,off)) all in the
                # ring: emit as-is (overlap handled by the kernel modulo)
                self._slot(0, take, off, 0)
                ml -= take
                continue
            if src < 0:
                take = -src              # pure-ring prefix of the chunk
                self._slot(0, take, off, 0)
                ml -= take
                continue
            if off < _MIN_SELF_OFF:
                # rewriting would shatter into off-sized crumbs; let the
                # device fix-point variant handle it (overlap included)
                res = None
            else:
                take = min(take, off)    # keep the source fully resolved
                res = self._resolve(src)
            if res is None:
                self.has_self = True
                self.cur_self = True
                self._slot(0, take, off, 0)
                ml -= take
                continue
            (kind, v), run = res
            take = min(take, run)
            if kind == "lit":
                # duplicate the bytes so the scan-derived literal layout
                # stays exact (cheap: rewrites are rare)
                self.push_lit(bytes(self.lit[v:v + take]))
            else:
                # v is a negative substep-local position; the ring only
                # holds the 64 KiB before the substep base
                if v < -65536:
                    self.has_self = True
                    self.cur_self = True
                    self._slot(0, take, off, 0)
                else:
                    self._slot(0, take, self.fill - v, 0)
            ml -= take

    def finish_chain(self):
        """Pad the current substep to SUB with zero literals."""
        if self.fill > 0 or self.cur:
            pad = SUB - self.fill
            while pad > 0:
                t = min(pad, 255, self.room())
                self.push_lit(b"\0" * t)
                pad -= t


def pack_dense(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    lit_bytes_parts: list,
    chain_bounds: list | None = None,
) -> DensePack:
    """Reference packer (Python).  ``lit_bytes_parts`` holds each
    sequence's literal bytes; ``chain_bounds`` gives sequence-index
    boundaries of independent chains (history restarts at each)."""
    n = lit_len.size
    bounds = chain_bounds if chain_bounds is not None else [0, n]
    lit_stream = bytearray()
    pk = _SubPacker(lit_stream)
    out_spans: list = []
    for c in range(len(bounds) - 1):
        sub_lo = len(pk.tbl_rows)
        out_len = 0
        for i in range(bounds[c], bounds[c + 1]):
            ll = int(lit_len[i])
            lits = lit_bytes_parts[i]
            lpos = 0
            while ll > 0:
                take = min(ll, 255, pk.room())
                pk.push_lit(bytes(lits[lpos:lpos + take]))
                lpos += take
                ll -= take
            pk.push_match(int(match_len[i]), max(int(match_off[i]), 1))
            out_len += int(lit_len[i]) + int(match_len[i])
        pk.finish_chain()
        out_spans.append((c, sub_lo, len(pk.tbl_rows), out_len))

    n_sub = len(pk.tbl_rows)
    lit_pad = (len(lit_stream) + LITROWS * ROWB + ROWB - 1) // ROWB * ROWB
    lit = np.zeros(lit_pad, np.uint8)
    lit[: len(lit_stream)] = np.frombuffer(bytes(lit_stream), np.uint8)
    scal = np.stack(pk.scal_rows) if n_sub else np.zeros((0, 8), np.int32)
    for (c, slo, shi, _n) in out_spans:
        # only local_base mod 64 KiB matters (ring addressing is modular),
        # which keeps the in-kernel f32 position math exact for chains of
        # any length
        scal[slo:shi, 0] = ((np.arange(shi - slo) * SUB) & 0xFFFF).astype(
            np.int32
        )
    tbl = np.stack(pk.tbl_rows) if n_sub else np.zeros((0, SLOTS), np.int32)
    bmap = (np.stack(pk.bmap_rows) if n_sub
            else np.zeros((0, SUB // 32), np.int32))
    return DensePack(tbl=tbl, scal=scal, bmap=bmap, lit=lit, n_sub=n_sub,
                     out_spans=out_spans, has_self=pk.has_self)


def pack_dense_native(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    lit_src: np.ndarray,
    buf: np.ndarray,
    chain_bounds: list | None = None,
    chain_ranges: list | None = None,
) -> DensePack:
    """Native-engine packer: identical output to :func:`pack_dense`
    (asserted by tests), ~100x faster.  Reads literal bytes straight
    from the input buffer via ``lit_src``.  ``chain_ranges`` selects
    possibly non-adjacent [lo, hi) sequence ranges, one per chain."""
    from .. import native

    if chain_ranges is None:
        bounds = (chain_bounds if chain_bounds is not None
                  else [0, lit_len.size])
        chain_ranges = list(zip(bounds[:-1], bounds[1:]))
    total_out = int(
        sum(int(lit_len[lo:hi].sum() + match_len[lo:hi].sum())
            for lo, hi in chain_ranges)
    )
    max_sub = total_out // SUB + len(chain_ranges) + 4
    lit_total = int(sum(int(lit_len[lo:hi].sum()) for lo, hi in chain_ranges))
    lit_cap = (lit_total + max(total_out // 4, 1 << 20)
               + len(chain_ranges) * SUB + LITROWS * ROWB + ROWB)
    # np.empty: the native packer fully writes every row it reports,
    # and unselected literal-window bytes are never routed by a one-hot
    tbl = np.empty((max_sub, SLOTS), np.int32)
    scal = np.empty((max_sub, 8), np.int32)
    bmap = np.empty((max_sub, SUB // 32), np.int32)
    lit = np.empty(lit_cap, np.uint8)
    ll = np.ascontiguousarray(lit_len, np.int32)
    ls = np.ascontiguousarray(lit_src, np.int32)
    ml = np.ascontiguousarray(match_len, np.int32)
    mo = np.ascontiguousarray(match_off, np.int32)

    sub_base = 0
    lit_base = 0
    has_self = False
    out_spans = []
    for c, (lo, hi) in enumerate(chain_ranges):
        n_sub, lit_base, hs = native.pack_dense_chain(
            buf, ll[lo:hi], ls[lo:hi], ml[lo:hi], mo[lo:hi],
            tbl, scal, bmap, lit, sub_base, lit_base,
        )
        has_self = has_self or hs
        out_len = int(ll[lo:hi].sum() + ml[lo:hi].sum())
        out_spans.append((c, sub_base, sub_base + n_sub, out_len))
        sub_base += n_sub
    lit_end = (lit_base + LITROWS * ROWB + ROWB - 1) // ROWB * ROWB
    return DensePack(
        tbl=tbl[:sub_base], scal=scal[:sub_base], bmap=bmap[:sub_base],
        lit=lit[:lit_end], n_sub=sub_base, out_spans=out_spans,
        has_self=has_self,
    )


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------

def _tri(n: int):
    import jax.numpy as jnp

    r = jnp.arange(n)
    return (r[:, None] < r[None, :]).astype(jnp.float32)


@functools.partial(
    __import__("jax").jit, static_argnames=("n_sub", "lit_rows")
)
def dense_prelude(tbl, lit_u8, *, n_sub: int, lit_rows: int):
    """XLA prep: per-slot scans (strict-upper-triangular MXU matmuls,
    exact in f32 below 2^24), int8 field matrix, bf16 literal rows."""
    import jax.numpy as jnp

    ll = (tbl & 0xFF).astype(jnp.float32)
    ml = ((tbl >> 8) & 0x7F).astype(jnp.float32)
    off = ((tbl >> 15) & 0x1FFFF).astype(jnp.int32)
    t = _tri(SLOTS)
    ds = jnp.dot(ll + ml, t, preferred_element_type=jnp.float32)
    lloc = jnp.dot(ll, t, preferred_element_type=jnp.float32)
    dsi = ds.astype(jnp.int32)
    lloci = lloc.astype(jnp.int32)
    f8 = jnp.stack(
        [
            (dsi >> 8) & 255,
            dsi & 255,
            (tbl & 0xFF),
            (off >> 8) & 255,
            off & 255,
            (lloci >> 8) & 255,
            lloci & 255,
            (off >> 16) & 1,
        ],
        axis=-1,
    ).astype(jnp.int8).reshape(n_sub * SLOTS, 8)
    litbf = lit_u8.astype(jnp.bfloat16).reshape(lit_rows, ROWB)
    return f8, litbf


def _make_kernel(with_fix: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _rows(v, nrows):
        """(1, N) -> (nrows, N/nrows) via lane slices + sublane concat
        (Mosaic rejects the equivalent reshape in this layout)."""
        w = v.shape[1] // nrows
        return jnp.concatenate(
            [v[:, r * w:(r + 1) * w] for r in range(nrows)], axis=0
        )

    def kern(f8_ref, bmap_ref, scal_ref, lit_ref, ring_in_ref,
             out_ref, flag_ref, ring_out_ref, ring):
        # Seed the history ring from the caller (zeros for a fresh
        # chain; the previous part's final ring for a continuation).
        # Never leave VMEM uninitialized: 0 * NaN = NaN would poison
        # the routing matmuls.
        ring[...] = ring_in_ref[...]
        flag_ref[0, 0] = 0
        n_sub = bmap_ref.shape[0]

        def body(i, carry):
            # ---- slot ownership from the boundary bitmap (1, SUB/8)
            # pltpu.repeat tiles the 64-word row 32x; the packer stored
            # byte j's flag in int32 word (j & 63), bit (j >> 6), so
            # lane j finds its flag at bit (j >> 6) of the tiled copy.
            bm32 = bmap_ref[pl.ds(i, 1), :]
            rep = pltpu.repeat(bm32, SUB // 64, axis=1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)
            bits = (rep >> (lanes >> 6)) & 1
            x = bits
            k = 1
            while k < SUB:                              # prefix sum on lanes
                r = pltpu.roll(x, k, axis=1)
                x = x + jnp.where(lanes >= k, r, 0)
                k <<= 1
            seq_id = x - 1                              # (1, SUB)

            # ---- per-byte fields via one-hot contraction on dim 0
            ohseq = (
                jax.lax.broadcasted_iota(jnp.int32, (SLOTS, SUB), 0)
                == seq_id
            ).astype(jnp.bfloat16)
            f8 = f8_ref[pl.ds(i * SLOTS, SLOTS), :]
            fbf = (f8.astype(jnp.int32) & 255).astype(jnp.bfloat16)
            F = jax.lax.dot_general(
                fbf, ohseq, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                           # (8, SUB)
            ds_b = F[0:1, :] * 256.0 + F[1:2, :]
            ll_b = F[2:3, :]
            off_b = F[3:4, :] * 256.0 + F[4:5, :] + F[7:8, :] * 65536.0
            lit_b = F[5:6, :] * 256.0 + F[6:7, :]

            jf = lanes.astype(jnp.float32)   # Mosaic rejects f32 iota
            B = scal_ref[i, 0]
            lbase = scal_ref[i, 1]

            rel_lit = jf - ds_b
            inlit = rel_lit < ll_b
            rel = rel_lit - ll_b
            # rem(rel, off) in f32; rel <= 254 so one correction suffices
            qd = jnp.floor(rel / off_b)
            r0 = rel - qd * off_b
            r0 = jnp.where(r0 < 0, r0 + off_b, r0)
            r0 = jnp.where(r0 >= off_b, r0 - off_b, r0)
            msrc = ds_b + ll_b - off_b + r0
            is_self = jnp.logical_and(jnp.logical_not(inlit), msrc >= 0)
            msrci = (msrc + jnp.asarray(B, jnp.float32)).astype(jnp.int32)

            page = jnp.where(
                inlit | is_self, -1, (msrci >> 8) & (PAGES - 1)
            )
            ohp = (
                jax.lax.broadcasted_iota(jnp.int32, (PAGES, SUB), 0) == page
            ).astype(jnp.bfloat16)
            yT = jax.lax.dot_general(
                ring[:, :], ohp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)                      # (ROWB, SUB)

            w8 = (lbase >> 8) & ~jnp.int32(7)
            lrows = lit_ref[pl.ds(pl.multiple_of(w8, 8), LITROWS), :]
            labsi = (lit_b + rel_lit).astype(jnp.int32) + (lbase - w8 * 256)
            lpage = jnp.where(inlit, labsi >> 8, -1)
            ohl = (
                jax.lax.broadcasted_iota(jnp.int32, (LITROWS, SUB), 0)
                == lpage
            ).astype(jnp.bfloat16)
            yT = yT + jax.lax.dot_general(
                lrows, ohl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

            qc = jnp.where(inlit, labsi & 255, msrci & 255)
            ohq = (
                jax.lax.broadcasted_iota(jnp.int32, (ROWB, SUB), 0) == qc
            ).astype(jnp.bfloat16)
            val = jnp.sum(
                (yT * ohq).astype(jnp.float32), axis=0, keepdims=True
            )                                           # (1, SUB)

            if with_fix:
                # Fix-point resolution, gated per substep: the packer
                # marks substeps with unresolved self references in
                # scal[:, 2]; everything else skips this entirely.
                def do_fix(val):
                    v0 = jnp.where(is_self, -1.0, val)
                    msrc_loc = msrc.astype(jnp.int32)
                    ohs = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (SUB // ROWB, SUB), 0
                        ) == jnp.where(is_self, msrc_loc >> 8, -1)
                    ).astype(jnp.bfloat16)
                    ohq2 = (
                        jax.lax.broadcasted_iota(jnp.int32, (ROWB, SUB), 0)
                        == jnp.where(is_self, msrc_loc & 255, -1)
                    ).astype(jnp.bfloat16)

                    def fix_pass(v):
                        sp = _rows(v, SUB // ROWB).astype(jnp.bfloat16)
                        ysT = jax.lax.dot_general(
                            sp, ohs, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(jnp.bfloat16)
                        nv = jnp.sum(
                            (ysT * ohq2).astype(jnp.float32), axis=0,
                            keepdims=True,
                        )
                        take = jnp.logical_and(v < 0, nv >= 0)
                        return jnp.where(take, nv, v)

                    v1 = fix_pass(fix_pass(v0))
                    v2, _ = jax.lax.while_loop(
                        lambda st: jnp.logical_and(
                            jnp.min(st[0]) < 0, st[1] < SUB
                        ),
                        lambda st: (fix_pass(st[0]), st[1] + 1),
                        (v1, jnp.int32(0)),
                    )
                    return v2

                val = jax.lax.cond(
                    scal_ref[i, 2] != 0, do_fix, lambda v: v, val
                )
            else:
                # correctness net: packer promised no self references
                cnt = jnp.sum(jnp.where(is_self, 1, 0), axis=1,
                              keepdims=True, dtype=jnp.int32)
                flag_ref[0, 0] = flag_ref[0, 0] + cnt[0, 0]

            vrows = _rows(val, SUB // ROWB).astype(jnp.bfloat16)
            row = pl.multiple_of(
                (B >> 8) & (PAGES - 1) & ~jnp.int32(SUB // ROWB - 1),
                SUB // ROWB,
            )
            ring[pl.ds(row, SUB // ROWB), :] = vrows
            out_ref[pl.ds(pl.multiple_of(i * (SUB // 128), SUB // 128),
                          SUB // 128), :] = (
                _rows(val, SUB // 128).astype(jnp.bfloat16)
            )
            return carry

        jax.lax.fori_loop(0, n_sub, body, 0)
        ring_out_ref[...] = ring[...]

    return kern


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n_sub", "lit_rows", "with_fix", "interpret"),
)
def _decode_dense_device(tbl, scal, bmap, lit_u8, ring_init=None, *,
                         n_sub, lit_rows, with_fix=False, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f8, litbf = dense_prelude(tbl, lit_u8, n_sub=n_sub, lit_rows=lit_rows)
    if ring_init is None:
        ring_init = jnp.zeros((PAGES, ROWB), jnp.bfloat16)
    rows, flag, ring_out = pl.pallas_call(
        _make_kernel(with_fix),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sub * SUB // 128, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((PAGES, ROWB), jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((PAGES, ROWB), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(f8, bmap, scal, litbf, ring_init)
    return rows.astype(jnp.uint8), flag, ring_out


PART_SUBS = MAX_PART_OUT // SUB      # substeps per kernel call
PART_LIT_CAP = 4 << 20               # literal bytes visible per part


def decode_dense_rows(pack: DensePack, interpret: bool = False) -> np.ndarray:
    """Decode a DensePack on device in ring-chained parts; returns the
    flat uint8 row bytes (n_sub * SUB,) on host.

    Large chains split at substep boundaries: the history ring is a
    kernel input/output, so part k+1 seeds its ring with part k's final
    64 KiB — the device analog of the reference's retained history
    across Update calls (lz4ada.adb:678-680).  Literal windows rebase
    per part so the VMEM-resident literal stream stays bounded."""
    import jax
    import jax.numpy as jnp

    outs = []
    ring = None
    p0 = 0
    while p0 < pack.n_sub:
        p1 = min(p0 + PART_SUBS, pack.n_sub)
        # shrink the part if its literal span exceeds the VMEM budget
        while True:
            lstart = int(pack.scal[p0, 1]) & ~2047
            lend = int(pack.scal[p1 - 1, 1]) + SUB + LITROWS * ROWB
            lend = (lend + 2047) & ~2047
            if lend - lstart <= PART_LIT_CAP or p1 <= p0 + 1:
                break
            p1 = max(p0 + 1, p0 + (p1 - p0) // 2)
        scal = pack.scal[p0:p1].copy()
        scal[:, 1] -= lstart
        lit = pack.lit[lstart:min(lend, pack.lit.size)]
        if lit.size < lend - lstart:
            lit = np.concatenate(
                [lit, np.zeros(lend - lstart - lit.size, np.uint8)]
            )
        rows, flag, ring = _decode_dense_device(
            jnp.asarray(pack.tbl[p0:p1]),
            jnp.asarray(scal),
            jnp.asarray(pack.bmap[p0:p1]),
            jnp.asarray(lit),
            ring,
            n_sub=p1 - p0,
            lit_rows=lit.size // ROWB,
            with_fix=pack.has_self,
            interpret=interpret,
        )
        if not pack.has_self:
            assert int(jax.device_get(flag)[0, 0]) == 0, (
                "packer promised no self references but the kernel saw some"
            )
        outs.append(np.asarray(jax.device_get(rows)).reshape(-1))
        p0 = p1
    return np.concatenate(outs) if len(outs) > 1 else outs[0]


def decode_dense(pack: DensePack, interpret: bool = False) -> list:
    """Decode a DensePack on device; returns [(chain_id, bytes)]."""
    flat = decode_dense_rows(pack, interpret)
    res = []
    for (c, slo, shi, out_len) in pack.out_spans:
        res.append((c, flat[slo * SUB: slo * SUB + out_len].tobytes()))
    return res
