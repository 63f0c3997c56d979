"""Streaming-FSM branch tests the vector drives miss: hasher fallback,
constructor reservation validation, update_into edge inputs and
exception-safety, and the legacy SINGLE_FRAME next-frame refusal
(reference: lz4ada.adb:435-461, 570-580)."""

import numpy as np
import pytest

import lz4tpu
from lz4tpu.constants import EndOfFrame, Reservation
from lz4tpu.errors import DataCorruption
from lz4tpu.stream import Decompressor, _new_hasher
from lz4tpu.xxh32 import XXHash32


def test_new_hasher_falls_back_to_pure_python(monkeypatch):
    from lz4tpu import native

    monkeypatch.setattr(native, "available", lambda: False)
    assert isinstance(_new_hasher(), XXHash32)

    def _boom():
        raise OSError("no toolchain")

    monkeypatch.setattr(native, "available", _boom)
    assert isinstance(_new_hasher(), XXHash32)


def test_plain_constructor_rejects_flexible_reservation():
    with pytest.raises(ValueError, match="concrete reservation"):
        Decompressor(Reservation.USE_FIRST)


def test_is_end_of_frame_method_alias():
    ctx = Decompressor(Reservation.SZ_8_MIB)
    assert ctx.is_end_of_frame() is ctx.end_of_frame
    assert ctx.is_end_of_frame() == EndOfFrame.NO


def test_update_into_rejects_bad_buffer_shape():
    ctx = Decompressor(Reservation.SZ_64_KIB)
    bad = np.zeros((ctx.min_buffer_size, 1), np.uint8)
    with pytest.raises(ValueError, match="1-D uint8"):
        ctx.update_into(b"\x04", bad)


def test_update_into_empty_input_no_output():
    ctx = Decompressor(Reservation.SZ_64_KIB)
    buf = np.zeros(ctx.min_buffer_size, np.uint8)
    consumed, first, last = ctx.update_into(b"", buf)
    assert consumed == 0 and last < first


def test_update_into_restores_buffer_on_error():
    frame = lz4tpu.compress(b"restore " * 64, block_max_code=4)
    ctx = Decompressor(Reservation.SZ_64_KIB)
    buf = np.zeros(ctx.min_buffer_size, np.uint8)
    bad = b"\x00\x00\x00\x00" + frame[4:]   # corrupt magic
    ctx2 = Decompressor(Reservation.SZ_64_KIB)
    saved = ctx2._buffer
    from lz4tpu.errors import NotSupported

    with pytest.raises(NotSupported):
        ctx2.update_into(bad, buf)
    # the internal buffer reference is restored on error (plain
    # update() keeps operating on the pre-call state)
    assert ctx2._buffer is saved
    del frame, ctx


def test_legacy_single_frame_refuses_next_frame():
    legacy = lz4tpu.compress(b"legacy payload " * 16,
                             frame_format="legacy")
    data = np.frombuffer(legacy + legacy, np.uint8)
    ctx, pos = Decompressor.from_header(data, Reservation.SINGLE_FRAME)
    with pytest.raises(DataCorruption):
        while pos < data.size:
            got, _ = ctx.update(data[pos:])
            if got == 0:
                break
            pos += got
