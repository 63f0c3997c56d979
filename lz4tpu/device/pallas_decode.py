"""Pallas TPU kernel: LZ4 chain decode by vectorized segment copies.

This is the TPU analog of the reference's wild-copy hot loop
(reference: lib/lz4ada.adb:790-904): sequences are walked in order, but
every byte movement is a wide VPU operation on 512-byte rows instead of
a scalar byte loop, and self-overlapping matches replay with the same
span-doubling the reference uses (adb:893-903).

Why this shape: per-byte formulations need hardware gather, which on
this TPU runs at ~7 ns/element (scalar-speed); contiguous segment
copies instead run at VPU width. LZ4 decode *is* a list of contiguous
copies, so the kernel processes, per sequence, one literal copy from
the compressed buffer and one match copy from the output's own recent
window.

Data layout (everything int32 words, 128 lanes = 512 bytes per row —
uint8 VMEM blocks crash this Mosaic toolchain):

- ``comp``: the chain's compressed bytes, word-packed, one 512 B pad
  row in front (all byte offsets are pre-shifted by +512 so window
  arithmetic never underruns row 0) and 4 slack rows behind.
- ``out``: the chain's decoded bytes in the same layout; kernel output.
- ``tbl``: int32 [S, 8] sequence table, streamed through SMEM in
  chunks by the grid: dst, lit_src, lit_len, match_off, match_len
  (columns 5..7 reserved). Offsets are byte offsets in the shifted
  coordinate system.

A "chain" is a run of output the format makes sequential (a frame, or
an independent block); the pipeline splits work into chains and falls
back to the XLA resolver when a chain exceeds VMEM capacity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_BYTES = 512          # leading pad row (coordinate shift)
ROW_BYTES = 512          # one (1,128) int32 row
SEQ_CHUNK = 256          # sequences per grid step (8 KiB of SMEM)
SLACK_ROWS = 12          # window overread slack (9-row slices)

# VMEM budget: comp + out + scratch must stay under ~14 MiB.
MAX_CHAIN_OUT = 6 << 20      # decoded bytes per chain handled here
MAX_CHAIN_COMP = 6 << 20


def _rows_for(nbytes: int) -> int:
    rows = (nbytes + ROW_BYTES - 1) // ROW_BYTES + SLACK_ROWS
    return (rows + 7) & ~7  # keep sublane-tile aligned


def _bucket(n: int, minimum: int = 8) -> int:
    """Power-of-two-ish rounding to bound the jit/compile cache (steps
    1x, 1.25x, 1.5x, 1.75x per octave)."""
    b = minimum
    while b < n:
        b <<= 1
    if b > minimum:
        for frac in (4, 5, 6, 7):
            cand = (b >> 3) * frac
            if cand >= n:
                return cand
    return b


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)


def _window(src_ref, w0, nrows: int = 1):
    """Aligned word window: returns (w, w1) where w[j] = words[w0 + j]
    and w1[j] = words[w0 + j + 1] as (1,128) int32.

    NB: empirically this exact formulation (3-row slice, per-row
    rolls) compiles ~3x faster end-to-end on this Mosaic toolchain
    than the seemingly equivalent 2-row/batched variants; do not
    "simplify" without re-measuring.
    """
    r0 = w0 // 128
    l0 = jax.lax.rem(w0, 128)
    rows = src_ref[pl.ds(r0, 3), :]                      # (3,128)
    # left-rotate lanes by l0, expressed as the equivalent non-negative
    # roll (pltpu.roll only accepts shifts >= 0)
    rolled = pltpu.roll(rows, jax.lax.rem(128 - l0, 128), axis=1)
    lanes = _lane_iota()
    seam = lanes < (128 - l0)
    w = jnp.where(seam, rolled[0:1, :], rolled[1:2, :])
    wb = jnp.where(seam, rolled[1:2, :], rolled[2:3, :])
    # w1[j] = window[j+1]
    w_r = pltpu.roll(w, 127, axis=1)
    wb_first = pltpu.roll(wb, 127, axis=1)
    w1 = jnp.where(lanes < 127, w_r, wb_first)
    return w, w1


def _blend_rows(src_ref, out_ref, r, nrows: int, a, rb, d, n):
    """Blend one output row r with realigned source words under the
    per-byte [d, d+n) mask (nrows kept for signature stability; only
    nrows=1 is used — see _window note)."""
    q0 = r * 128
    w, w1 = _window(src_ref, q0 + a)
    rb_u = rb.astype(jnp.uint32)
    rb_inv = ((32 - rb) & 31).astype(jnp.uint32)
    wu = w.astype(jnp.uint32)
    w1u = w1.astype(jnp.uint32)
    combined = jnp.where(
        rb == 0,
        wu,
        jax.lax.shift_right_logical(wu, rb_u)
        | jax.lax.shift_left(w1u, rb_inv),
    ).astype(jnp.int32)

    # Per-word byte masks: bytes [lo, hi) of each word are in-copy.
    word_byte0 = r * ROW_BYTES + _lane_iota() * 4
    lo = jnp.clip(d - word_byte0, 0, 4)
    hi = jnp.clip(d + n - word_byte0, 0, 4)
    m_hi = jnp.where(
        hi >= 4,
        jnp.uint32(0xFFFFFFFF),
        jax.lax.shift_left(jnp.uint32(1), (hi * 8).astype(jnp.uint32))
        - jnp.uint32(1),
    )
    m_lo = jax.lax.shift_left(
        jnp.uint32(1), (lo * 8).astype(jnp.uint32)
    ) - jnp.uint32(1)
    mask = (m_hi & ~m_lo).astype(jnp.int32)

    old = out_ref[pl.ds(r, 1), :]
    out_ref[pl.ds(r, 1), :] = (old & ~mask) | (combined & mask)


def _copy_bytes(src_ref, s, out_ref, d, n):
    """Copy n bytes from byte offset s of src_ref to byte offset d of
    out_ref (word-packed layout, shifted coordinates).

    One guard + one row loop. Measured on v5e: @pl.when bodies appear
    to be predicated (both sides pay), so adding "fast path" branches
    makes everything slower — keep exactly one code path.
    """
    delta = s - d
    a = delta >> 2                      # floor word offset
    rb = (delta & 3) * 8                # bit shift within word

    @pl.when(n > 0)
    def _():
        r_first = d // ROW_BYTES
        r_last = (d + n - 1) // ROW_BYTES

        def row_body(r, _):
            _blend_rows(src_ref, out_ref, r, 1, a, rb, d, n)
            return 0

        jax.lax.fori_loop(r_first, r_last + 1, row_body, 0)


def _decode_kernel(nseq_ref, comp_ref, tbl_ref, out_ref):
    """Grid step: decode SEQ_CHUNK sequences from the SMEM table."""
    chunk = pl.program_id(0)
    base = chunk * SEQ_CHUNK
    n_seqs = nseq_ref[0]

    def seq_body(i, _):
        @pl.when(base + i < n_seqs)
        def _():
            d = tbl_ref[i * 8 + 0]
            lit_src = tbl_ref[i * 8 + 1]
            lit_len = tbl_ref[i * 8 + 2]
            m_off = tbl_ref[i * 8 + 3]
            m_len = tbl_ref[i * 8 + 4]

            _copy_bytes(comp_ref, lit_src, out_ref, d, lit_len)

            md = d + lit_len
            raw = md - m_off

            @pl.when(m_len > 0)
            def _():
                # Replication loop: one iteration unless the match
                # overlaps itself; then span-doubling replay
                # (reference: lz4ada.adb:893-903).
                def body(state):
                    cursor, rem = state
                    k = jnp.minimum(cursor - raw, rem)
                    _copy_bytes(out_ref, raw, out_ref, cursor, k)
                    return cursor + k, rem - k

                jax.lax.while_loop(lambda st: st[1] > 0, body, (md, m_len))

        return 0

    jax.lax.fori_loop(0, SEQ_CHUNK, seq_body, 0)


@functools.partial(
    jax.jit, static_argnames=("out_rows", "grid", "interpret")
)
def _chain_decode(
    n_seqs, comp_words, tbl, *, out_rows: int, grid: int, interpret: bool
):
    return pl.pallas_call(
        _decode_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                comp_words.shape, lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SEQ_CHUNK * 8,), lambda c: (c,), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, 128), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
        interpret=interpret,
    )(n_seqs, comp_words, tbl)


def decode_chain_device(
    comp: np.ndarray,        # uint8: chain-relevant slice of the input
    dst: np.ndarray,         # int32 [S] output byte offsets (chain-local)
    lit_src: np.ndarray,     # int32 [S] literal offsets into `comp`
    lit_len: np.ndarray,     # int32 [S]
    match_off: np.ndarray,   # int32 [S]
    match_len: np.ndarray,   # int32 [S]
    n_out: int,
    interpret: bool = False,
):
    """Decode one chain; returns the device output handle (word rows).

    Decoded bytes live at flat byte offsets [PAD_BYTES, PAD_BYTES+n_out)
    of the returned (rows, 128) int32 array.
    """
    s = dst.size
    s_pad = _bucket(max(s, 1), minimum=SEQ_CHUNK)
    s_pad = ((s_pad + SEQ_CHUNK - 1) // SEQ_CHUNK) * SEQ_CHUNK

    tbl = np.zeros((s_pad, 8), np.int32)
    tbl[:s, 0] = dst + PAD_BYTES
    tbl[:s, 1] = lit_src + PAD_BYTES
    tbl[:s, 2] = lit_len
    tbl[:s, 3] = np.maximum(match_off, 1)
    tbl[:s, 4] = match_len
    # padded rows must be harmless no-ops
    tbl[s:, 0] = PAD_BYTES
    tbl[s:, 1] = PAD_BYTES
    tbl[s:, 3] = 1

    comp_rows = _bucket(_rows_for(PAD_BYTES + comp.size))
    comp_words = np.zeros((comp_rows, 128), np.int32)
    flat = comp_words.view(np.uint8).reshape(-1)
    flat[PAD_BYTES:PAD_BYTES + comp.size] = comp

    out_rows = _bucket(_rows_for(PAD_BYTES + n_out))
    return _chain_decode(
        jnp.asarray(np.array([s], np.int32)),
        jnp.asarray(comp_words),
        jnp.asarray(tbl.reshape(-1)),
        out_rows=out_rows,
        grid=s_pad // SEQ_CHUNK,
        interpret=interpret,
    )


def decode_chain(
    comp: np.ndarray,
    dst: np.ndarray,
    lit_src: np.ndarray,
    lit_len: np.ndarray,
    match_off: np.ndarray,
    match_len: np.ndarray,
    n_out: int,
    interpret: bool = False,
) -> np.ndarray:
    """Decode one chain on the device; returns uint8[n_out] on host."""
    out = decode_chain_device(
        comp, dst, lit_src, lit_len, match_off, match_len, n_out,
        interpret=interpret,
    )
    out_np = np.asarray(jax.device_get(out))
    return out_np.view(np.uint8).reshape(-1)[PAD_BYTES:PAD_BYTES + n_out]
