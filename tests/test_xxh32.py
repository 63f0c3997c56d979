"""XXHash32 unit tests: pure-Python vs native vs known values.

Known-answer values match the reference's inline micro-test
(reference: test_suite/lz4test.adb:129-147) and the xxhash spec
test vectors.
"""

import os

import pytest

from lz4tpu.xxh32 import XXHash32, xxh32


def test_reference_inline_vector_byte_at_a_time():
    tc = bytes(
        [0x1A] * 14 + [0x11, 0x10]
    )
    ctx = XXHash32()
    for b in tc:
        ctx.update(bytes([b]))
    assert ctx.final() == 0xF994EF8A


def test_known_values():
    assert xxh32(b"") == 0x02CC5D05
    assert XXHash32(seed=0).update(b"").final() == 0x02CC5D05
    # Classic xxhash sanity strings
    assert XXHash32().update(b"Hello, world.").final() == xxh32(b"Hello, world.")


def test_refinalizable_and_resettable():
    h = XXHash32()
    h.update(b"abc")
    mid = h.final()
    h.update(b"def")
    assert h.final() == XXHash32().update(b"abcdef").final()
    h.reset()
    h.update(b"abc")
    assert h.final() == mid


@pytest.mark.parametrize("n", [0, 1, 3, 4, 15, 16, 17, 64, 1023, 4096, 70000])
def test_native_matches_python(n):
    native = pytest.importorskip("lz4tpu.native")
    if not native.available():
        pytest.skip("native engine unavailable")
    data = os.urandom(n)
    assert native.native_xxh32(data) == XXHash32().update(data).final()
    # streaming split points
    h = native.NativeXXH32()
    h.update(data[: n // 3]).update(data[n // 3:])
    assert h.final() == XXHash32().update(data).final()
