"""MXU byte-provenance routing decoder (the dense engine).

LZ4's hot loop walks sequences one at a time and moves bytes with
scalar wild copies (reference: lib/lz4ada.adb:716-904).  On TPU a
sequential walk is hopeless for text-like data (~5 bytes/sequence),
and per-byte gathers run at scalar speed.  The key observation is that
everything about a block's decode EXCEPT the byte values themselves is
a pure function of the compressed stream — static at pack time:

* The packer resolves EVERY output byte's provenance exactly, by
  memoized chain-following (the per-byte generalization of the
  reference's overlapping-match replay, lib/lz4ada.adb:893-903): each
  byte is either a KNOWN VALUE (literals, and any match byte whose
  intra-substep chain terminates at a literal) or a RING POSITION
  (a byte decoded in an earlier 2 KiB substep, necessarily within the
  trailing 64 KiB — offsets are <= 65535 and chain-following only
  shortens distances to at most offset range).  There is no third case,
  so the kernel needs no fix-point pass, no slot machinery, and no
  literal window: one int32 code word per output byte.

* The kernel, per 2 KiB substep: decode the code word (VPU int ops),
  route the 64 KiB VMEM history ring with ONE (256,256)x(256,1024)
  bf16 matmul that serves TWO output bytes per column — bytes b and
  b+1024 share column b with page weights {1, 256}; ring values are
  <= 255 so the routed sum ring_a + 256*ring_b <= 65535 is exact in
  the f32 accumulator and splits back into 8-bit fields — then select
  each byte within its routed page row (int32 VPU ops), add the
  known-value bytes, write the ring and the output block.  Substep
  code words stream from HBM via the grid's block pipeline.

The paired matmul halves the MXU FLOPs per byte (2*65536 -> 65536)
vs one column per byte; interleaved A/B on v5e measures the paired +
int-select kernel ~20% faster end-to-end than the unpaired one (the
substep is VPU/latency-bound around the matmul, so the FLOP halving
is not a full 2x).  A slot-table predecessor that derived provenance
in-kernel (bitmap prefix sums, field matmuls, a fix-point pass for
self references) ran 3x slower; per-byte pack-time resolution
subsumed all of it.  The ring is a kernel input/output, so multi-part
and cross-device continuation chain naturally (reference analog:
retained history across Update calls, lz4ada.adb:678-680).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

SUB = 2048          # output bytes per substep
PAGES = 256         # 64 KiB history ring: 256 pages x 256 bytes
ROWB = 256          # bytes per ring row
_KIND_RING = 1 << 16


@dataclasses.dataclass
class DensePack2:
    """Device-ready per-byte routing codes for one or more chains.

    code[i, j] describes output byte j of substep i:
      bit 16 set   -> ring byte: bits 0..15 = source position mod 64 Ki
      bit 16 clear -> known value: bits 17..24 = the byte
    """

    code: np.ndarray       # int32 [n_sub, SUB]
    scal: np.ndarray       # int32 [n_sub, 1]: ring row to write (mult of 8)
    n_sub: int
    out_spans: list        # [(chain_id, sub_lo, sub_hi, out_len)]


def _pack_chain(
    ll: np.ndarray, ls: np.ndarray, ml: np.ndarray, mo: np.ndarray,
    buf: np.ndarray,
) -> tuple[np.ndarray, int]:
    """Resolve one chain's per-byte provenance; returns (code, n_out)."""
    sizes = (ll + ml).astype(np.int64)
    n_out = int(sizes.sum())
    if n_out == 0:
        return np.zeros((0,), np.int32), 0
    starts = np.zeros(sizes.size, np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    seq = np.repeat(np.arange(sizes.size, dtype=np.int64), sizes)
    j = np.arange(n_out, dtype=np.int64)
    local = j - starts[seq]
    is_lit = local < ll[seq]
    # literal byte values straight from the compressed buffer
    litpos = np.where(is_lit, ls[seq].astype(np.int64) + local, 0)
    litval = buf[litpos].astype(np.int32)
    # match source: byte m of a match copies from (j - off), always
    src = j - mo[seq]
    sub_base = j & ~np.int64(SUB - 1)

    # One resolve hop: fixed points are literals and bytes whose source
    # lies before their substep; everything else steps to its source
    # (same substep, since src >= sub_base and src < j).
    fixed = is_lit | (src < sub_base)
    h = np.where(fixed, j, src)
    # Pointer doubling: chains are intra-substep, <= SUB-1 hops.
    k = 1
    while k < SUB:
        h = h[h]
        k <<= 1
    a = h
    code = np.where(
        is_lit[a],
        litval[a] << 17,
        (src[a] & 0xFFFF).astype(np.int64) | _KIND_RING,
    ).astype(np.int32)
    return code, n_out


def pack_dense2(
    lit_len: np.ndarray,
    match_len: np.ndarray,
    match_off: np.ndarray,
    lit_src: np.ndarray,
    buf: np.ndarray,
    chain_ranges: list | None = None,
) -> DensePack2:
    """Pack sequence-table ranges (one per independent chain) into
    per-byte routing codes.  Uses the native resolver when available
    (bit-identical; asserted by tests), numpy otherwise."""
    from .. import native

    if chain_ranges is None:
        chain_ranges = [(0, lit_len.size)]
    ll = np.ascontiguousarray(lit_len, np.int32)
    ls = np.ascontiguousarray(lit_src, np.int32)
    ml = np.ascontiguousarray(match_len, np.int32)
    mo = np.ascontiguousarray(match_off, np.int32)

    use_native = native.available()
    # Pre-size every chain so codes pack straight into one padded
    # (n_sub, SUB) array — no per-chain pad/concat copies.
    sizes64 = ll.astype(np.int64) + ml
    chain_outs = [int(sizes64[lo:hi].sum()) for lo, hi in chain_ranges]
    chain_subs = [-(-n // SUB) if n else 0 for n in chain_outs]
    total_subs = sum(chain_subs)
    if total_subs == 0:
        return DensePack2(
            code=np.zeros((0, SUB), np.int32),
            scal=np.zeros((0, 1), np.int32),
            n_sub=0,
            out_spans=[
                (c, 0, 0, 0) for c in range(len(chain_ranges))
            ],
        )
    flat = np.zeros(total_subs * SUB + 16, np.int32)
    scal = np.empty((total_subs, 1), np.int32)
    out_spans = []
    sub_base = 0
    for c, (lo, hi) in enumerate(chain_ranges):
        n_out = chain_outs[c]
        if n_out == 0:
            out_spans.append((c, sub_base, sub_base, 0))
            continue
        dst = flat[sub_base * SUB:]
        if use_native:
            native.pack_dense2_chain(
                buf, ll[lo:hi], ls[lo:hi], ml[lo:hi], mo[lo:hi], out=dst
            )
        else:
            code, _ = _pack_chain(
                ll[lo:hi], ls[lo:hi], ml[lo:hi], mo[lo:hi], buf
            )
            dst[:n_out] = code
        n_sub_c = chain_subs[c]
        scal[sub_base:sub_base + n_sub_c, 0] = (
            (np.arange(n_sub_c, dtype=np.int32) * (SUB // ROWB))
            & (PAGES - 1)
        )
        out_spans.append((c, sub_base, sub_base + n_sub_c, n_out))
        sub_base += n_sub_c
    return DensePack2(
        code=flat[:total_subs * SUB].reshape(total_subs, SUB),
        scal=scal, n_sub=total_subs, out_spans=out_spans,
    )


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------

def _make_kernel(n_sub: int):
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

    def kern(code_ref, scal_ref, ring_in_ref, out_ref, ring_out_ref, ring):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ring[...] = ring_in_ref[...]

        # code block arrives as (8, SUB/8); reassemble the (1, SUB)
        # lane-major row (inverse of _rows)
        code = jnp.concatenate(
            [code_ref[r:r + 1, :] for r in range(8)], axis=1
        )                                             # (1, SUB) int32
        is_ring = (code >> 16) & 1
        srcpos = code & 0xFFFF
        page = jnp.where(is_ring == 1, srcpos >> 8, -1)
        base = ((code >> 17) & 255).astype(jnp.float32)

        # Paired routing: bytes b and b+SUB/2 share matmul column b with
        # page weights {1, 256}.  ring values are <= 255 so the routed
        # sum ring_a + 256*ring_b <= 65535 is exact in the f32
        # accumulator, and the two page rows split back out as the low
        # and mid 8-bit fields.  Halves the MXU FLOPs per byte vs one
        # column per byte.  When both bytes of a pair want the SAME
        # page, the 1+256 entry would not be a representable bf16
        # weight; instead the pair's column keeps only the weight-1
        # entry and the high byte reads the low field (same page row).
        half = SUB // 2
        pa = page[:, :half]
        pb = page[:, half:]
        collide = jnp.logical_and(pa == pb, pb >= 0)
        pb_eff = jnp.where(collide, -2, pb)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (PAGES, half), 0)
        ohp = (
            (iota_p == pa).astype(jnp.bfloat16)
            + (iota_p == pb_eff).astype(jnp.bfloat16) * 256
        )
        yT = jax.lax.dot_general(
            ring[...], ohp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (ROWB, half)
        yi = yT.astype(jnp.int32)
        f0 = yi & 255
        f1 = jnp.where(collide, f0, yi >> 8)
        # In-page select in pure int32 (no float casts of the (ROWB,
        # SUB) intermediates): interleaved A/B on hardware put this 10%
        # ahead of the f32 multiply-sum and 17% ahead of an MXU
        # ones-matmul reduction (the tiny matmul stalls the MXU pipe).
        fields = jnp.concatenate([f0, f1], axis=1)
        qc = srcpos & 255
        vali = jnp.sum(
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (ROWB, SUB), 0) == qc,
                fields, 0,
            ),
            axis=0, keepdims=True,
        )
        val = vali.astype(jnp.float32) + base

        row = scal_ref[i % 8, 0]
        ring[pl.ds(pl.multiple_of(row, SUB // ROWB), SUB // ROWB), :] = (
            _rows(val, SUB // ROWB).astype(jnp.bfloat16)
        )
        out_ref[...] = _rows(val, SUB // 128).astype(jnp.bfloat16)
        ring_out_ref[...] = ring[...]

    return kern


@functools.partial(
    __import__("jax").jit, static_argnames=("n_sub", "interpret")
)
def _decode_dense2_device(code, scal, ring_init=None, *,
                          n_sub, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if ring_init is None:
        ring_init = jnp.zeros((PAGES, ROWB), jnp.bfloat16)
    if n_sub % 8:
        scal = jnp.concatenate(
            [scal, jnp.zeros((8 - n_sub % 8, 1), jnp.int32)]
        )
    rows, ring_out = pl.pallas_call(
        _make_kernel(n_sub),
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec((8, SUB // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # windowed SMEM (8 rows per window, shared by 8 steps): a
            # whole-array SMEM input hits Mosaic's window-allocation
            # limit past ~1024 rows, capping decodable chains at ~2 MiB
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PAGES, ROWB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUB // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGES, ROWB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sub * SUB // 128, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((PAGES, ROWB), jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((PAGES, ROWB), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(code.reshape(n_sub * 8, SUB // 8), scal, ring_init)
    return rows.astype(jnp.uint8), ring_out


PART_SUBS = 32768      # substeps per launch (64 MiB output, 256 MiB codes)


def decode_dense2_rows(pack: DensePack2, interpret: bool = False,
                       ring_init=None, part_subs: int | None = None,
                       ) -> np.ndarray:
    """Decode a DensePack2 on device; returns flat uint8 row bytes
    (n_sub * SUB,) on host.

    One kernel launch streams code words and output rows through the
    grid's block pipeline (VMEM holds only the ring plus one substep's
    blocks), so a launch handles any size HBM affords.  Chains larger
    than ``part_subs`` substeps split at substep boundaries across
    launches, each seeding its ring with the previous part's final
    64 KiB — the device analog of the reference's retained history
    across Update calls (lz4ada.adb:678-680) — which bounds the
    device-resident code array regardless of chain size."""
    import jax
    import jax.numpy as jnp

    if pack.n_sub == 0:
        return np.zeros(0, np.uint8)
    part = part_subs or PART_SUBS
    if pack.n_sub <= part:
        rows, _ring = _decode_dense2_device(
            jnp.asarray(pack.code), jnp.asarray(pack.scal), ring_init,
            n_sub=pack.n_sub, interpret=interpret,
        )
        return np.asarray(jax.device_get(rows)).reshape(-1)
    out = np.empty(pack.n_sub * SUB, np.uint8)
    ring = ring_init
    for p0 in range(0, pack.n_sub, part):
        p1 = min(p0 + part, pack.n_sub)
        rows, ring = _decode_dense2_device(
            jnp.asarray(pack.code[p0:p1]), jnp.asarray(pack.scal[p0:p1]),
            ring, n_sub=p1 - p0, interpret=interpret,
        )
        out[p0 * SUB:p1 * SUB] = np.asarray(
            jax.device_get(rows)
        ).reshape(-1)
    return out


def decode_dense2_rows_on_device(pack: DensePack2, interpret: bool = False,
                                 ring_init=None,
                                 part_subs: int | None = None):
    """decode_dense2_rows, but the flat uint8 rows stay a device array
    (for HBM-resident consumers).  Same part-wise launch bound: chains
    beyond ``part_subs`` substeps split across launches with ring
    carry, so the device-resident code transient stays bounded; part
    outputs are concatenated on device."""
    import jax
    import jax.numpy as jnp

    if pack.n_sub == 0:
        return jnp.zeros(0, jnp.uint8)
    part = part_subs or PART_SUBS
    if pack.n_sub <= part:
        rows, _ring = _decode_dense2_device(
            jnp.asarray(pack.code), jnp.asarray(pack.scal), ring_init,
            n_sub=pack.n_sub, interpret=interpret,
        )
        return rows.reshape(-1)
    parts = []
    ring = ring_init
    for p0 in range(0, pack.n_sub, part):
        p1 = min(p0 + part, pack.n_sub)
        rows, ring = _decode_dense2_device(
            jnp.asarray(pack.code[p0:p1]), jnp.asarray(pack.scal[p0:p1]),
            ring, n_sub=p1 - p0, interpret=interpret,
        )
        parts.append(rows.reshape(-1))
    return jnp.concatenate(parts)


def decode_dense2(pack: DensePack2, interpret: bool = False) -> list:
    """Decode a DensePack2 on device; returns [(chain_id, bytes)]."""
    flat = decode_dense2_rows(pack, interpret)
    res = []
    for (c, slo, shi, out_len) in pack.out_spans:
        res.append((c, flat[slo * SUB: slo * SUB + out_len].tobytes()))
    return res
