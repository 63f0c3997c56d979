"""Vector-driven black-box tests of the host streaming engine.

Mirrors the reference test strategy (reference:
test_suite/lz4test.adb:32-127): decode every good vector with a single
default context, compare bit-exactly against the .bin ground truth, at
both 4096-byte and 1-byte input granularity (the 1-byte run proves the
FSM is re-entrant at arbitrary chunk boundaries). Final EOF status must
not be NO, and the decoder must not produce less data than the ground
truth.
"""

import numpy as np
import pytest

from lz4tpu import Decompressor, EndOfFrame, decompress_host
from conftest import good_vector_names

# 1-byte-granularity runs are O(input bytes) Python-level update calls;
# cap them to keep the suite fast while still covering every format
# feature (all formats appear among the small vectors).
ONE_BYTE_MAX_INPUT = 64 * 1024


def _decode_streaming(data: bytes, chunk: int) -> bytes:
    arr = np.frombuffer(data, dtype=np.uint8)
    ctx = Decompressor()
    out = bytearray()
    pos = 0
    stall = 0
    while pos < arr.size:
        window = arr[pos:pos + chunk]
        consumed, produced = ctx.update(window)
        out += produced
        pos += consumed
        stall = stall + 1 if consumed == 0 else 0
        assert stall < 4, "decoder made no progress"
    assert ctx.end_of_frame != EndOfFrame.NO, "EOF not signalled at end"
    return bytes(out)


@pytest.mark.parametrize("name", good_vector_names())
def test_good_vector_whole(vectors_dir, name):
    data = (vectors_dir / f"{name}.lz4").read_bytes()
    ref = (vectors_dir / f"{name}.bin").read_bytes()
    assert decompress_host(data) == ref


@pytest.mark.parametrize("name", good_vector_names())
def test_good_vector_4k_chunks(vectors_dir, name):
    data = (vectors_dir / f"{name}.lz4").read_bytes()
    ref = (vectors_dir / f"{name}.bin").read_bytes()
    assert _decode_streaming(data, 4096) == ref


@pytest.mark.parametrize("name", good_vector_names())
def test_good_vector_1_byte_chunks(vectors_dir, name):
    data = (vectors_dir / f"{name}.lz4").read_bytes()
    if len(data) > ONE_BYTE_MAX_INPUT:
        pytest.skip("large vector: 1-byte run covered by the small ones")
    ref = (vectors_dir / f"{name}.bin").read_bytes()
    assert _decode_streaming(data, 1) == ref


def test_z9m_self_consistent(vectors_dir):
    """z9m.bin is absent upstream; the frame's own content checksum and
    the construction (zeros) pin the expected output."""
    data = (vectors_dir / "z9m.lz4").read_bytes()
    out = decompress_host(data)  # raises on content-checksum mismatch
    assert out == b"\x00" * len(out)
    assert len(out) == 9437166


def test_two_legacy_frames_byte_at_a_time():
    """Reference inline test (lz4test.adb:149-214): a 78-byte buffer of
    two concatenated legacy frames decoded one byte at a time."""
    tc = bytes(
        [
            0x02, 0x21, 0x4C, 0x18, 0x30, 0x00, 0x00, 0x00, 0xF0, 0x1F,
            0x3C, 0x3F, 0x78, 0x6D, 0x6C, 0x20, 0x76, 0x65, 0x72, 0x73,
            0x69, 0x6F, 0x6E, 0x3D, 0x22, 0x31, 0x2E, 0x30, 0x22, 0x20,
            0x65, 0x6E, 0x63, 0x6F, 0x64, 0x69, 0x6E, 0x67, 0x3D, 0x22,
            0x55, 0x54, 0x46, 0x2D, 0x38, 0x22, 0x3F, 0x3E, 0x3C, 0x74,
            0x65, 0x73, 0x74, 0x2F, 0x3E, 0x0A, 0x02, 0x21, 0x4C, 0x18,
            0x0E, 0x00, 0x00, 0x00, 0xD0, 0x48, 0x65, 0x6C, 0x6C, 0x6F,
            0x20, 0x77, 0x6F, 0x72, 0x6C, 0x64, 0x2E, 0x0A,
        ]
    )
    expect = b'<?xml version="1.0" encoding="UTF-8"?><test/>\nHello world.\n'
    from lz4tpu import FOR_ALL

    ctx, consumed = Decompressor.from_header(tc, reservation=FOR_ALL)
    out = bytearray()
    for i in range(consumed, len(tc)):
        got = 0
        spins = 0
        while got == 0:
            got, produced = ctx.update(tc[i:i + 1])
            out += produced
            spins += 1
            assert spins < 4 or got or produced
    assert bytes(out) == expect


def test_hello_raw_block():
    """Reference inline test (lz4test.adb:216-248): raw block decode."""
    tc = bytes(
        [0xD0, 0x48, 0x65, 0x6C, 0x6C, 0x6F, 0x2C, 0x20, 0x77, 0x6F,
         0x72, 0x6C, 0x64, 0x2E]
    )
    ctx = Decompressor.for_block(len(tc))
    consumed, out = ctx.update(tc)
    assert consumed == len(tc)
    assert out == b"Hello, world."
    assert ctx.end_of_frame == EndOfFrame.YES
