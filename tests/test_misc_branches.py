"""Small fallback/edge branches: pure-Python block decode when the
native engine is unavailable, the xxh32 convenience fallback, and the
legacy batch parser's SINGLE_FRAME / oversized-block exits
(reference: lz4ada.adb:435-461, 541-553)."""

import numpy as np
import pytest

import lz4tpu
from lz4tpu import block
from lz4tpu.constants import MAGIC_LEGACY, Reservation
from lz4tpu.errors import DataCorruption, NotSupported
from lz4tpu.frame import parse_frames


def test_block_ring_python_fallback(monkeypatch):
    from lz4tpu import native

    raw = bytes([0x50]) + b"Hello"   # 5 literals, no match
    buf_native = np.zeros(1 << 17, np.uint8)
    buf_py = np.zeros(1 << 17, np.uint8)
    n1 = block.decode_block_ring(raw, buf_native, 0, 0)
    monkeypatch.setattr(native, "available", lambda: False)
    n2 = block.decode_block_ring(raw, buf_py, 0, 0)
    assert n1 == n2 == 5
    np.testing.assert_array_equal(buf_native[:5], buf_py[:5])
    assert buf_py[:5].tobytes() == b"Hello"


def test_xxh32_convenience_fallback(monkeypatch):
    from lz4tpu import native
    from lz4tpu.xxh32 import XXHash32, xxh32

    data = bytes(range(256)) * 32    # >= 4096: native path eligible
    want = XXHash32(0).update(data).final()

    def _boom(*a, **k):
        raise OSError("engine gone")

    monkeypatch.setattr(native, "native_xxh32", _boom)
    assert xxh32(data) == want


def test_legacy_parse_single_frame_refuses_second_magic():
    legacy = lz4tpu.compress(b"legacy " * 32, frame_format="legacy")
    two = np.frombuffer(legacy + legacy, np.uint8)
    with pytest.raises(DataCorruption):
        parse_frames(two, Reservation.SINGLE_FRAME)
    # and parses cleanly without the policy
    parsed = parse_frames(two, Reservation.SZ_8_MIB)
    assert len(parsed.frames) == 2


def test_legacy_parse_block_too_large():
    hdr = MAGIC_LEGACY.to_bytes(4, "little")
    bad = hdr + (0x00F0_0000).to_bytes(4, "little")  # > 8 MiB bound
    with pytest.raises((DataCorruption, NotSupported)):
        parse_frames(np.frombuffer(bad, np.uint8), Reservation.SZ_8_MIB)
