"""Span-parallel decode of MONOLITHIC dependent-block chains.

The reference decodes dependent blocks strictly sequentially through
its 64 KiB history ring (/root/reference/lib/lz4ada.adb:845-904; ring
wrap adb:678-680), so one frame of linked blocks is one serial chain.
The rebuild's chain-parallel path (dist.decode_sharded_chains) can
only shard streams that contain MANY chains; the BASELINE-named
vectors (t1111k, b3444k) are each ONE chain, which until round 5 left
them either on a single device or on the correctness-only span-sharded
resolver (round-4 verdict, missing #1).

This module splits one chain into SPANS at substep (2048 B) boundaries
so each span decodes through the full-rate fused kernel
(device/fused.py) independently:

* **Span sequence columns** — the chain's sequence table restricted to
  the span's output range, with the two boundary sequences clipped
  (a cut inside a literal run shortens it and advances lit_src; a cut
  inside a match shortens the match, keeping its offset).  Coordinates
  are SPAN-LOCAL: the existing prep (native lz4tpu_prep_fused) runs
  unchanged, and every field invariant (V mod 64 Ki, patch
  classification per 2048-B substep, record budgets) is preserved
  because span boundaries coincide with substep boundaries.
* **Boundary ring seeds** — a span's back-references may reach up to
  64 KiB before its start.  The kernel already takes the history ring
  as an explicit input (``ring_init``), so the host materializes the
  64 KiB of output preceding each boundary WITHOUT decoding the
  stream: every output byte is ultimately a copy of some literal byte
  (first byte of a frame must be a literal; match bytes copy earlier
  output), so ``resolve_ring_bytes`` chain-follows provenance through
  the sequence table — with a per-sequence modular shortcut for
  overlapping matches and per-round deduplication, so RLE-style data
  (a 64 Ki window that is one repeated pattern) collapses to a handful
  of unique positions after one round — and gathers the resolved
  literal positions straight from the compressed buffer.  Host work is
  O(64 Ki * depth) per boundary, not O(output).

Two consumers:

* ``dist.py`` — spans of one chain are balanced across mesh devices
  like independent chains; each device seeds its ring from the
  host-resolved boundary bytes (multi-chip decode of a single chain
  at full kernel rate).
* ``pipeline.py`` — single-device pipelined decode: spans launch in
  order with the ring CHAINED ON DEVICE (span k's ring output feeds
  span k+1, exactly like the fused engine's part-split launcher), so
  the host preps span k+1 while the device decodes span k — no
  boundary resolution needed at all.

Ring-chaining requires span lengths that are multiples of the 64 KiB
ring (so ring addresses, which are positions mod ring size, line up
across span-local coordinate rebases); ``plan_spans`` aligns all
boundaries to 32 substeps.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .device import fused

SUB = fused.SUB
RING = 1 << 16            # history ring bytes (reference History_Size)
RING_SUBS = RING // SUB   # 32 substeps per ring window
# Provenance-walk budget: total positions touched across rounds per
# resolve call.  Real data is far below (text depth <= ~64 with a
# shrinking active set; RLE collapses after one round); pathological
# inputs overflow and the caller simply does not span-split.
_RESOLVE_WORK_MAX = 1 << 24


class SpanResolveOverflow(Exception):
    """Provenance walk exceeded its work budget; the chain is not
    span-split (callers fall back to monolithic decode)."""


@dataclasses.dataclass
class ChainSpan:
    """One span of a chain, with SPAN-LOCAL sequence columns."""

    sub_lo: int           # first substep (chain-global)
    sub_hi: int           # one past last substep (chain-global)
    out_lo: int           # chain-local output byte range
    out_hi: int
    ll: np.ndarray        # span-local sequence columns (int32)
    ml: np.ndarray
    mo: np.ndarray
    ls: np.ndarray        # global offsets into the compressed buffer


def plan_spans(n_out: int, n_parts: int,
               min_subs: int = 2 * RING_SUBS) -> list[tuple[int, int]]:
    """Split ``n_out`` chain bytes into up to ``n_parts`` substep
    ranges, every boundary a multiple of RING_SUBS (64 KiB) so device
    ring-chaining across spans needs no relayout, and no span shorter
    than ``min_subs`` substeps (tiny spans pay launch + ring-seed
    overhead for no parallelism)."""
    n_sub = -(-n_out // SUB) if n_out else 0
    if n_sub == 0 or n_parts <= 1:
        return [(0, n_sub)] if n_sub else []
    units = -(-n_sub // RING_SUBS)           # 64 KiB units (last partial)
    min_units = max(1, min_subs // RING_SUBS)
    parts = min(n_parts, units // min_units)
    if parts <= 1:
        return [(0, n_sub)]
    # spread units as evenly as possible: sizes differ by <= 1 unit
    base, rem = divmod(units, parts)
    out = []
    lo_u = 0
    for k in range(parts):
        hi_u = lo_u + base + (1 if k < rem else 0)
        out.append((lo_u * RING_SUBS, min(hi_u * RING_SUBS, n_sub)))
        lo_u = hi_u
    return out


def _starts_ext(ll: np.ndarray, ml: np.ndarray) -> np.ndarray:
    """Chain-local exclusive prefix of sequence sizes, with an end
    sentinel: starts_ext[s] = output position where sequence s
    begins; starts_ext[S] = n_out."""
    sizes = ll.astype(np.int64) + ml.astype(np.int64)
    starts = np.zeros(sizes.size + 1, np.int64)
    np.cumsum(sizes, out=starts[1:])
    return starts


def split_chain_spans(
    ll: np.ndarray, ml: np.ndarray, mo: np.ndarray, ls: np.ndarray,
    ranges: list[tuple[int, int]],
    starts: np.ndarray | None = None,
) -> list[ChainSpan]:
    """Build span-local sequence columns for each substep range.

    The clipping rule is uniform over every sequence of a span: with
    sequence s spanning output [st, st+l) literals then
    [st+l, st+l+m) match bytes, the span [B0, B1) keeps

        ll' = max(0, min(st+l, B1) - max(st, B0))
        ls' = ls + max(B0 - st, 0)
        ml' = max(0, min(st+l+m, B1) - max(st+l, B0))

    (middle sequences are unchanged; only the two boundary sequences
    actually clip).  A match clipped at its head keeps its offset: the
    dropped head bytes land in the previous span, and the kept bytes'
    sources move before B0 — ring territory covered by the span's
    ring seed."""
    if starts is None:
        starts = _starts_ext(ll, ml)
    S = ll.size
    spans = []
    for (slo_sub, shi_sub) in ranges:
        B0 = slo_sub * SUB
        B1 = min(shi_sub * SUB, int(starts[S]))
        s_lo = int(np.searchsorted(starts, B0, side="right")) - 1
        s_lo = max(s_lo, 0)
        s_hi = int(np.searchsorted(starts, B1, side="left"))  # excl
        st = starts[s_lo:s_hi]
        l_ = ll[s_lo:s_hi].astype(np.int64)
        m_ = ml[s_lo:s_hi].astype(np.int64)
        lit_end = st + l_
        ll2 = np.clip(np.minimum(lit_end, B1) - np.maximum(st, B0),
                      0, None)
        ml2 = np.clip(np.minimum(lit_end + m_, B1)
                      - np.maximum(lit_end, B0), 0, None)
        ls2 = ls[s_lo:s_hi].astype(np.int64) + np.maximum(B0 - st, 0)
        mo2 = np.maximum(mo[s_lo:s_hi].astype(np.int64), 1)
        total = int(ll2.sum() + ml2.sum())
        if total != B1 - B0:
            raise AssertionError(
                f"span clip mismatch: {total} != {B1 - B0}"
            )
        spans.append(ChainSpan(
            sub_lo=slo_sub, sub_hi=shi_sub, out_lo=B0, out_hi=B1,
            ll=ll2.astype(np.int32), ml=ml2.astype(np.int32),
            mo=mo2.astype(np.int32), ls=ls2.astype(np.int32),
        ))
    return spans


def resolve_ring_bytes(
    ll: np.ndarray, ml: np.ndarray, mo: np.ndarray, ls: np.ndarray,
    buf: np.ndarray, boundary: int, nbytes: int = RING,
    starts: np.ndarray | None = None,
    work_max: int = _RESOLVE_WORK_MAX,
) -> np.ndarray:
    """Boundary ring bytes via the native resolver when available
    (lz4core.cpp lz4tpu_resolve_window: ascending in-window memo +
    run-amortized chain walks, ~100x the numpy rounds below), falling
    back to the vectorized numpy walk (the differential reference).
    Both raise on pathological chain depth (SpanResolveOverflow /
    native depth cap -> SpanResolveOverflow)."""
    from . import native

    if starts is None:
        starts = _starts_ext(ll, ml)
    if native.available():
        st32 = np.ascontiguousarray(starts, np.int32)
        try:
            return native.resolve_window(
                np.ascontiguousarray(ll, np.int32),
                np.ascontiguousarray(ml, np.int32),
                np.ascontiguousarray(mo, np.int32),
                np.ascontiguousarray(ls, np.int32),
                np.ascontiguousarray(buf, np.uint8),
                st32, boundary, nbytes, hop_budget=work_max,
            )
        except ValueError as exc:
            raise SpanResolveOverflow(str(exc)) from None
    return _resolve_ring_bytes_numpy(
        ll, ml, mo, ls, buf, boundary, nbytes, starts, work_max
    )


def _resolve_ring_bytes_numpy(
    ll: np.ndarray, ml: np.ndarray, mo: np.ndarray, ls: np.ndarray,
    buf: np.ndarray, boundary: int, nbytes: int = RING,
    starts: np.ndarray | None = None,
    work_max: int = _RESOLVE_WORK_MAX,
) -> np.ndarray:
    """Materialize chain output bytes [boundary - nbytes, boundary)
    by provenance chain-following — NO sequential decode.

    Descent: each round maps every still-unresolved position to its
    owning sequence; literal positions resolve immediately (their byte
    is ``buf[lit_src + local]``); match positions hop to their source
    with the overlapping-match modular shortcut (positions inside a
    match whose source is inside the same match collapse in ONE hop to
    ``m0 - off + (p - m0) mod off``), then deduplicate.  Every hop
    strictly decreases the position, so the walk terminates; the work
    cap bounds adversarial inputs (SpanResolveOverflow -> caller does
    not split).  Ascent: resolved values propagate back through the
    per-round dedup indices.

    Returns uint8[nbytes]; positions before the chain start are zero
    (never referenced: the scan validates back-references against the
    frame start, the reference's H_Offset check lz4ada.adb:867-874).
    """
    if starts is None:
        starts = _starts_ext(ll, ml)
    out = np.zeros(nbytes, np.uint8)
    lo = max(boundary - nbytes, 0)
    if lo >= boundary:
        return out
    pos = np.arange(lo, boundary, dtype=np.int64)
    base_slot = nbytes - (boundary - lo)

    ll64 = ll.astype(np.int64)
    rounds = []   # (values or None, lit_mask, inv) per round
    work = 0
    while pos.size:
        work += pos.size
        if work > work_max:
            raise SpanResolveOverflow(work)
        s = np.searchsorted(starts, pos, side="right") - 1
        np.maximum(s, 0, out=s)
        local = pos - starts[s]
        is_lit = local < ll64[s]
        vals = np.zeros(pos.size, np.uint8)
        if is_lit.any():
            li = np.where(is_lit)[0]
            vals[li] = buf[ls[s[li]].astype(np.int64) + local[li]]
        mi = np.where(~is_lit)[0]
        if mi.size == 0:
            rounds.append((vals, is_lit, None, None))
            break
        sm = s[mi]
        off = np.maximum(mo[sm].astype(np.int64), 1)
        m0 = starts[sm] + ll64[sm]
        p = pos[mi]
        hop = p - off
        deep = hop >= m0
        if deep.any():
            hop = np.where(deep, m0 - off + (p - m0) % off, hop)
        uniq, inv = np.unique(hop, return_inverse=True)
        rounds.append((vals, is_lit, mi, inv))
        pos = uniq

    # ascent
    prev_vals = None
    for (vals, is_lit, mi, inv) in reversed(rounds):
        if mi is not None:
            vals[mi] = prev_vals[inv]
        prev_vals = vals
    out[base_slot:] = prev_vals
    return out


def ring_seed_array(ring_bytes: np.ndarray, boundary: int,
                    rpages: int = fused.RPAGES):
    """Lay boundary bytes out as the kernel's ring_init: a (rpages,
    256) bf16 block where flat index (q mod rpages*256) holds chain
    output byte q, for q in [boundary - rpages*256, boundary).

    ``ring_bytes`` is resolve_ring_bytes' [boundary - n, boundary)
    window (n >= rpages*256).  plan_spans boundaries are multiples of
    the 64 KiB ring and rpages*256 divides 64 KiB, so chain-global and
    span-local positions agree mod rpages*256 — one layout serves both
    the chain-coordinate sliced preps (slice_prep) and the span-local
    preps (split_chain_spans)."""
    import jax.numpy as jnp

    w = rpages * 256
    tail = ring_bytes[-w:]
    flat = np.zeros(w, np.uint8)
    q0 = boundary - w
    flat[(q0 + np.arange(w)) % w] = tail
    return jnp.asarray(flat.reshape(rpages, 256), jnp.bfloat16)


def prep_span(span: ChainSpan, buf: np.ndarray,
              pooled: bool = True) -> fused.FusedPrep:
    """Fused prep of one span in span-local coordinates (the native
    prep runs unchanged — a span is indistinguishable from a chain
    except that its ring is seeded at decode time).  ``pooled=False``
    for callers that hold several span preps alive at once (the prep
    buffer pool is 4 deep)."""
    return fused.prep_fused(span.ll, span.ml, span.mo, span.ls, buf,
                            pooled=pooled)


def split_fused_chain(table, chain, buf: np.ndarray, n_parts: int,
                      with_rings: bool = True):
    """Top-level helper: spans + preps + boundary ring seeds for one
    chain of a pipeline.SeqTable.

    Returns (spans, preps, rings) with rings[k] the uint8[RING]
    boundary window for span k (rings[0] is None — empty history), or
    rings=None when ``with_rings=False`` (device ring-chaining).
    Raises fused.FusedOverflow / SpanResolveOverflow when the chain
    cannot split; callers fall back to monolithic decode."""
    sl = slice(chain.seq_lo, chain.seq_hi)
    ll = table.lit_len[sl]
    ml = table.match_len[sl]
    mo = table.match_off[sl]
    ls = table.lit_src[sl]
    n_out = chain.out_hi - chain.out_lo
    ranges = plan_spans(n_out, n_parts)
    if len(ranges) <= 1:
        return None
    starts = _starts_ext(ll, ml)
    spans = split_chain_spans(ll, ml, mo, ls, ranges, starts)
    # pooled=False: all span preps stay alive together, beyond the
    # prep buffer pool's recycling depth
    preps = [prep_span(s, buf, pooled=False) for s in spans]
    rings = None
    if with_rings:
        rings = [None] + resolve_rings(
            ll, ml, mo, ls, buf, [s.out_lo for s in spans[1:]], starts
        )
    return spans, preps, rings


def resolve_rings(ll, ml, mo, ls, buf, boundaries: list[int],
                  starts: np.ndarray | None = None) -> list[np.ndarray]:
    """Boundary windows for several boundaries, resolved concurrently
    (the native walk releases the GIL; each boundary's cost is fixed
    in the window size and chain depth, independent of span length, so
    threads hide it behind each other on multi-core hosts)."""
    from . import native

    if starts is None:
        starts = _starts_ext(ll, ml)
    threads = native.pack_threads() if native.available() else 1
    if len(boundaries) > 1 and threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(threads, len(boundaries))
        ) as ex:
            return list(ex.map(
                lambda b: resolve_ring_bytes(
                    ll, ml, mo, ls, buf, b, RING, starts),
                boundaries,
            ))
    return [resolve_ring_bytes(ll, ml, mo, ls, buf, b, RING, starts)
            for b in boundaries]


def slice_prep(prep: fused.FusedPrep, sub_lo: int, sub_hi: int,
               out_len: int) -> fused.FusedPrep:
    """A substep-range view of a whole-chain fused prep, in CHAIN
    coordinates — the production span path for dist (one prep per
    chain, sliced per device):

    * records/patches are per-substep, so a slice carries exactly the
      substeps' content — a slice of a prep that fit every budget can
      never overflow;
    * the per-substep scalars (u0/v0/b0 carries, ring row, window
      offset) are chain-global, so the slice's first substep is
      self-describing; sequences straddling the boundary contribute
      through the carries, their record having landed in the previous
      slice's substeps;
    * ring addresses stay chain-position mod ring size, matching
      ring_seed_array's layout.

    The literal windows are shared (every slice ships the whole
    ``lits`` array); n_seq_recs/n_patches are the WHOLE prep's totals
    (informational only).  The kernel reloads the literal window at
    grid step 0 unconditionally, covering a slice whose first substep
    has reload flag 0."""
    return fused.FusedPrep(
        seqrec=prep.seqrec[sub_lo:sub_hi],
        lits=prep.lits,
        winq=prep.winq[sub_lo:sub_hi],
        scal=prep.scal[sub_lo:sub_hi],
        patch=prep.patch[sub_lo:sub_hi],
        n_sub=sub_hi - sub_lo,
        n_patches=prep.n_patches,
        n_seq_recs=prep.n_seq_recs,
        out_spans=[(0, 0, sub_hi - sub_lo, out_len)],
        max_off=prep.max_off,
        max_recs=prep.max_recs,
        max_patches=prep.max_patches,
    )


def decode_span_on_device(prep: fused.FusedPrep, ring_bytes, boundary,
                          interpret: bool = False):
    """Decode one host-seeded span; returns the flat uint8 device rows
    (n_sub*SUB,).  ``ring_bytes=None`` means empty history (span 0)."""
    rp = fused.fused_rpages(prep.max_off)
    ring = None
    if ring_bytes is not None:
        ring = ring_seed_array(ring_bytes, boundary, rp)
    return fused.decode_fused_rows_on_device(
        prep, interpret=interpret, ring_init=ring
    )
