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

import numpy as np

from .constants import FOR_ALL, Reservation
from .errors import (
    DataCorruption,
    err_content_size_exceeded,
    err_content_size_leftover,
    err_block_checksum,
    err_content_checksum,
)
from .frame import FrameRec, ParseResult, parse_frames
from .xxh32 import xxh32


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


def _oracle_rerun(data: bytes, reservation: Reservation) -> bytes:
    """Produce the contract-exact error by re-running the streaming path."""
    from .api import decompress_host
    from .stream import Decompressor

    reservation = Reservation(reservation)
    if reservation.is_concrete:
        return decompress_host(data, reservation)
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    ctx, consumed = Decompressor.from_header(arr, reservation)
    out = bytearray()
    stall = 0
    while consumed < arr.size:
        got, chunk = ctx.update(arr[consumed:])
        out += chunk
        consumed += got
        stall = stall + 1 if got == 0 else 0
        if stall > 4:
            break
    return bytes(out)


def build_seq_table(
    buf: np.ndarray, parsed: ParseResult, reservation: Reservation, data
) -> SeqTable:
    """Token-scan every block into one global sequence table.

    Uncompressed blocks become single literal-only pseudo-sequences.
    Raises with reference parity on malformed payloads (via oracle
    re-run, so embedded diagnostic values match exactly).
    """
    from . import native

    chunks: list[tuple[np.ndarray, ...]] = []
    spans: list[BlockSpan] = []
    n_out = 0
    n_seq = 0
    frame_bounds = [0] * (len(parsed.frames) + 1)
    for frame in parsed.frames:
        frame_start_out = n_out
        for blk in frame.blocks:
            span = BlockSpan(
                frame_id=frame.frame_id,
                seq_lo=n_seq, seq_hi=n_seq,
                out_lo=n_out, out_hi=n_out,
                independent=frame.block_independence,
            )
            payload = buf[blk.comp_off:blk.comp_off + blk.comp_len]
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
                n_seq += 1
                span.seq_hi = n_seq
                span.out_hi = n_out
                spans.append(span)
                continue
            status, ll, ls, ml, mo, total = native.scan_sequences(payload)
            if status != native.OK:
                _oracle_rerun(data, reservation)
                raise DataCorruption("Malformed block payload.")
            sizes = ll.astype(np.int64) + ml
            starts = n_out + np.concatenate(
                [np.zeros(1, np.int64), np.cumsum(sizes[:-1])]
            )
            # Back-reference range check: a match may not reach before
            # the start of its frame (equivalent to the reference's
            # H_Offset < 0 check, lz4ada.adb:867-874).
            mstart = starts + ll
            bad = (ml > 0) & (mstart - mo < frame_start_out)
            if bad.any():
                _oracle_rerun(data, reservation)
                raise DataCorruption("Back-reference out of range.")
            chunks.append(
                (
                    starts.astype(np.int32),
                    ll,
                    ls + np.int32(blk.comp_off),
                    ml,
                    mo,
                )
            )
            n_out += total
            n_seq += ll.size
            span.seq_hi = n_seq
            span.out_hi = n_out
            spans.append(span)
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
    return SeqTable(
        out_start=cols[0],
        lit_len=cols[1],
        lit_src=cols[2],
        match_len=cols[3],
        match_off=np.maximum(cols[4], 1),
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


def decompress_device(
    data,
    reservation: Reservation = FOR_ALL,
    engine: str = "auto",
    interpret: bool = False,
) -> bytes:
    """Decode a whole buffer via the device pipeline.

    engine: "pallas" (segment-copy kernel, chain-wise), "resolve"
    (byte-parallel XLA resolver), or "auto" (pallas on TPU when every
    chain fits VMEM, resolve otherwise).
    """
    import jax
    import jax.numpy as jnp

    from .device import decode as dev

    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    if buf.size == 0:
        return b""
    parsed = parse_frames(buf, reservation)
    table = build_seq_table(buf, parsed, reservation, data)
    if table.n_out == 0:
        return b""

    if engine == "auto":
        on_tpu = jax.devices()[0].platform != "cpu"
        engine = (
            "pallas" if on_tpu and _pallas_fits(table, parsed) else "resolve"
        )
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
