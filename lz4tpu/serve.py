"""Pipelined decode service: overlap host preprocessing with device
execution.

A decode request passes through two stages with very different
resources:

  host   frame parse -> native token scan -> provenance pack
         (lz4tpu/native, single-core C++; ~msec per request)
  device sparse XLA programs / dense MXU routing kernel
         (lz4tpu/device; async-dispatched, runs on the TPU)

The reference is a synchronous pull parser — one `Update` call does
both jobs on one core (lib/lz4ada.adb:383-418).  On TPU the idiomatic
shape is a two-stage pipeline: JAX dispatch is asynchronous, so as soon
as request N's kernels are enqueued the host core is free to parse and
pack request N+1 while the TPU chews on N.  ``DecodeSession`` packages
that: a background thread runs the host stage and enqueues device work;
callers collect results in submission order.

Host-stage packing is substep-parallel by construction — ring codes
never read other codes and inherit codes only read within their own
2 KiB substep (see native lz4tpu_pack_dense2) — so on multi-core hosts
the prep thread can be sharded further; this box exposes one core, so
the session keeps a single prep thread.

Usage::

    with DecodeSession() as s:
        tickets = [s.submit(blob) for blob in blobs]
        outputs = [t.result() for t in tickets]
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .constants import Reservation, FOR_ALL
from .errors import Lz4Error
from . import pipeline as pl


class DecodeTicket:
    """Handle for one submitted buffer; ``result()`` blocks until the
    decoded bytes are ready (or re-raises the decode error with
    reference-parity diagnostics)."""

    def __init__(self, session: "DecodeSession"):
        self._session = session
        self._done = threading.Event()
        self._release_lock = threading.Lock()
        self._released = False
        self._error: BaseException | None = None
        # set by the prep thread on success:
        self._buf: np.ndarray | None = None
        self._parsed = None
        self._table = None
        self._segs: list | None = None   # [(out_lo, device array)]
        self._out_np: bytes | None = None
        self._out_dev = None             # cached device-resident result
        self._verified = False           # checksums checked (either path)

    # -- prep-thread side -------------------------------------------------
    def _fail(self, exc: BaseException) -> None:
        self._error = exc
        self._done.set()

    def _finish(self, buf, parsed, table, segs) -> None:
        self._buf = buf
        self._parsed = parsed
        self._table = table
        self._segs = segs
        self._done.set()

    # -- caller side --------------------------------------------------------
    def _release_slot_once(self) -> None:
        """Free the session's in-flight slot exactly once (result() and
        result_on_device() may race from different threads; the session
        semaphore must not be double-released)."""
        with self._release_lock:
            if self._released:
                return
            self._released = True
        self._session._slots.release()

    def result(self, timeout: float | None = None) -> bytes:
        if not self._done.wait(timeout):
            raise TimeoutError("decode not finished")
        self._release_slot_once()
        if self._error is not None:
            raise self._error
        if self._out_np is None:
            import jax

            if self._table is None:        # empty input fast path
                self._out_np = b""
                self._verified = True
            elif self._segs is None:
                # already collected via result_on_device: fetch that
                out = np.asarray(jax.device_get(self._out_dev)).tobytes()
                if not self._verified:
                    # collected earlier with verify="none": settle the
                    # checksum contract now that bytes are host-side
                    self._session._verify(self._buf, self._parsed, out,
                                          self._table)
                    self._mark_verified()
                self._out_np = out
            else:
                out = bytearray(self._table.n_out)
                for lo, arr in self._segs:
                    seg = np.asarray(jax.device_get(arr))
                    out[lo:lo + seg.size] = seg.tobytes()
                out = bytes(out)
                if not self._verified:
                    # a prior result_on_device(verify="device") may have
                    # settled the contract already (and dropped the
                    # inputs it needed) while leaving zero-output segs
                    # in place — do not verify twice
                    self._session._verify(self._buf, self._parsed, out,
                                          self._table)
                self._out_np = out
                self._segs = None
                self._mark_verified()
        return self._out_np

    def _mark_verified(self) -> None:
        """Checksum contract settled: drop the inputs kept for it."""
        self._verified = True
        self._buf = None
        self._parsed = None

    def result_on_device(self, timeout: float | None = None,
                         verify: str = "device"):
        """Like result(), but the decoded bytes stay a device-resident
        uint8 jax.Array (the HBM consumer path, cf.
        decompress_to_device).  verify: "device" (content checksums via
        the Pallas xxh32 segment hasher, no output fetch) or "none"
        (skip for now; a later result() on the same ticket still
        verifies before returning bytes).
        """
        if verify not in ("device", "none"):
            raise ValueError(
                f"result_on_device verify must be 'device' or 'none', "
                f"got {verify!r}"
            )
        if not self._done.wait(timeout):
            raise TimeoutError("decode not finished")
        self._release_slot_once()
        if self._error is not None:
            raise self._error
        import jax
        import jax.numpy as jnp

        def _verify_dev(out_dev):
            if verify == "device" and not self._verified:
                from .pipeline import _verify_checksums_device

                if self._table is not None:
                    _verify_checksums_device(
                        self._buf, self._parsed, out_dev, self._table,
                        self._session.interpret
                        or jax.devices()[0].platform == "cpu",
                    )
                self._mark_verified()

        if self._out_dev is not None:
            _verify_dev(self._out_dev)
            return self._out_dev
        if self._out_np is not None:
            # already collected as host bytes (result() or the host
            # fallback) — both verified; stage those
            self._out_dev = jnp.asarray(
                np.frombuffer(self._out_np, np.uint8)
            )
            return self._out_dev
        if self._table is None or not self._segs:
            self._out_dev = jnp.zeros(
                0 if self._table is None else self._table.n_out, jnp.uint8
            )
            _verify_dev(self._out_dev)
            return self._out_dev
        from .pipeline import assemble_device_segments

        out_dev = assemble_device_segments(self._segs, self._table.n_out)
        _verify_dev(out_dev)
        self._out_dev = out_dev
        self._segs = None
        return out_dev


class DecodeSession:
    """Two-stage pipelined decoder (host prep thread + async device
    dispatch).  Results come back in submission order via tickets.

    max_inflight bounds the number of requests that have been submitted
    but whose results have not been collected yet — that is, it bounds
    the HBM held by pending outputs.  ``submit`` blocks once the bound
    is reached until a ``result()`` call frees a slot, so every ticket
    must eventually be collected.
    """

    def __init__(self, reservation: Reservation = FOR_ALL,
                 max_inflight: int = 4, interpret: bool = False):
        self.reservation = Reservation(reservation)
        self.interpret = interpret
        self._q: "queue.Queue" = queue.Queue()
        self._max_inflight = max(1, max_inflight)
        self._slots = threading.BoundedSemaphore(self._max_inflight)
        self._lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(
            target=self._prep_loop, name="lz4tpu-prep", daemon=True
        )
        self._thread.start()

    # -- submission ---------------------------------------------------------
    def submit(self, data) -> DecodeTicket:
        self._slots.acquire()
        t = DecodeTicket(self)
        with self._lock:
            if self._closed:
                self._slots.release()
                raise RuntimeError("session closed")
            self._q.put((t, bytes(data)))
        return t

    def decode_all(self, blobs) -> list[bytes]:
        tickets = []
        outs = []
        # keep the submission window below the in-flight bound by
        # collecting the oldest result first, so this never deadlocks
        # against a blocking submit for any blob count
        for b in blobs:
            while len(tickets) >= self._max_inflight:
                outs.append(tickets.pop(0).result())
            tickets.append(self.submit(b))
        outs.extend(t.result() for t in tickets)
        return outs

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._thread.join()

    def __enter__(self) -> "DecodeSession":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- prep thread ----------------------------------------------------------
    def _prep_loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            ticket, data = item
            try:
                self._prep_one(ticket, data)
            except BaseException as e:          # noqa: BLE001
                ticket._fail(e)

    def _prep_one(self, ticket: DecodeTicket, data: bytes) -> None:
        buf = np.frombuffer(data, dtype=np.uint8)
        if buf.size == 0:
            ticket._finish(buf, None, None, [])
            return
        parsed = pl.parse_frames(buf, self.reservation)
        try:
            table = pl.build_seq_table(buf, parsed, self.reservation,
                                       data, pooled_cols=True)
        except pl.BatchCapacityExceeded:
            from .api import decompress_host

            # the streaming host engine fully verifies checksums itself
            ticket._out_np = decompress_host(data, self.reservation)
            ticket._verified = True
            ticket._done.set()
            return
        if table.n_out == 0:
            ticket._finish(buf, parsed, table, [])
            return
        # Enqueue device work (shared with decompress_to_device); jax
        # dispatch is async, so this returns as soon as the kernels are
        # queued and the TPU overlaps the next request's prep.
        segs = pl.build_device_segments(
            buf, table, pl.plan_decode(buf, parsed, table), self.interpret
        )
        ticket._finish(buf, parsed, table, segs)

    # -- result-side checksum verification --------------------------------
    @staticmethod
    def _verify(buf, parsed, out: bytes, table) -> None:
        pl._verify_checksums(
            buf, parsed, np.frombuffer(out, np.uint8), table
        )


__all__ = ["DecodeSession", "DecodeTicket", "Lz4Error"]
