"""Differential fuzz: every backend must agree with the host oracle.

The reference pins behavior with 24 curated vectors + 15 corruption
vectors (test_suite/lz4test.adb); this suite extends that with
generated inputs — payload shapes chosen to hit every engine the
classifier can route to — and random corruptions, asserting that the
device pipeline and the streaming host engine produce identical bytes
or identical reference-parity diagnostics.
"""

import numpy as np
import pytest

import lz4tpu
from lz4tpu import errors


def _payloads():
    rng = np.random.default_rng(42)
    out = []
    # zeros / RLE (sparse engine)
    out.append(("zeros", b"\x00" * 150_000))
    out.append(("rle", b"abcabcabc" * 12_000))
    # text-like, short matches (dense engine)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over",
             b"lazy", b"dog", b"lorem", b"ipsum", b"dolor", b"sit"]
    text = b" ".join(words[rng.integers(0, len(words))]
                     for _ in range(30_000))
    out.append(("text", text))
    # incompressible (uncompressed blocks / literal-dominated)
    out.append(("random", bytes(rng.integers(0, 256, 120_000,
                                             dtype=np.uint8))))
    # periodic with period > MAX_PATTERN (self-overlap segments)
    out.append(("periodic", bytes(rng.integers(0, 256, 100,
                                               dtype=np.uint8)) * 1500))
    # mixed: compressible head, random tail, zero middle
    out.append(("mixed", text[:50_000] + b"\x00" * 30_000
                + bytes(rng.integers(0, 256, 40_000, dtype=np.uint8))))
    # tiny and empty
    out.append(("tiny", b"x"))
    out.append(("empty", b""))
    return out


@pytest.mark.parametrize("name,payload", _payloads())
class TestRoundTripAllBackends:
    def test_default_encoder(self, name, payload):
        blob = lz4tpu.compress(payload)
        assert lz4tpu.decompress(blob, backend="host") == payload
        assert lz4tpu.decompress(blob, backend="device") == payload

    def test_optimal_encoder(self, name, payload):
        blob = lz4tpu.compress(payload, level=10)
        assert lz4tpu.decompress(blob, backend="host") == payload
        assert lz4tpu.decompress(blob, backend="device") == payload

    def test_legacy_frame(self, name, payload):
        blob = lz4tpu.compress(payload, frame_format="legacy")
        assert lz4tpu.decompress(blob, backend="host") == payload
        assert lz4tpu.decompress(blob, backend="device") == payload


class TestLengthExtremes:
    """Length extremes, added after a run-length bug that only
    manifested on matches spanning multiple 64 Ki ring wraps: the
    shapes that stress every length-encoding and run-splitting path."""

    def test_giant_single_match(self):
        # one ~700 KiB match at a >=2048 offset (multi-wrap ring fill)
        rng = np.random.default_rng(31)
        pat = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        payload = b"prefix " * 512 + pat * 180
        blob = lz4tpu.compress(payload)
        assert lz4tpu.decompress(blob, backend="host") == payload
        assert lz4tpu.decompress(blob, backend="device") == payload

    def test_giant_literal_run(self):
        # ~300 KiB of incompressible literals inside one sequence
        rng = np.random.default_rng(32)
        lits = bytes(rng.integers(0, 256, 300_000, dtype=np.uint8))
        payload = b"abcabcabc" * 400 + lits + b"abcabcabc" * 400
        blob = lz4tpu.compress(payload)
        assert lz4tpu.decompress(blob, backend="host") == payload
        assert lz4tpu.decompress(blob, backend="device") == payload

    def test_255_chain_boundaries(self):
        # literal/match lengths at every 255-extension boundary
        for n in (14, 15, 16, 269, 270, 271, 524, 525, 526):
            rng = np.random.default_rng(n)
            lits = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            payload = lits + b"Z" * (n + 4) + lits
            blob = lz4tpu.compress(payload, level=10)
            assert lz4tpu.decompress(blob, backend="host") == payload, n
            assert lz4tpu.decompress(blob, backend="device") == payload, n

    def test_small_offset_long_match(self):
        # off < 2048 with a long run exercises the segmented
        # inherit/ring split in the native resolver
        for off in (1, 2, 3, 7, 64, 65, 2047):
            payload = bytes(i % 251 for i in range(off)) * ((500_000 // max(off, 1)) + 1)
            blob = lz4tpu.compress(payload[:500_000])
            assert lz4tpu.decompress(blob, backend="host") == payload[:500_000], off
            assert lz4tpu.decompress(blob, backend="device") == payload[:500_000], off


class TestConcatenationFuzz:
    def test_random_archives(self):
        rng = np.random.default_rng(7)
        parts = []
        blob = b""
        for k in range(6):
            n = int(rng.integers(1, 30_000))
            p = (bytes(rng.integers(0, 256, n, dtype=np.uint8))
                 if k % 2 else b"seg%d " % k * (n // 6 + 1))
            parts.append(p)
            fmt = "legacy" if k in (2, 4) else "frame"
            blob += lz4tpu.compress(p, frame_format=fmt)
        want = b"".join(parts)
        assert lz4tpu.decompress(blob, backend="host") == want
        assert lz4tpu.decompress(blob, backend="device") == want


def _decode_outcome(data, backend):
    """(ok, payload-or-(type, ada_image)) for differential comparison."""
    try:
        return True, lz4tpu.decompress(data, backend=backend)
    except errors.Lz4Error as e:
        return False, (type(e).__name__, e.ada_image())


class TestStreamingChunkFuzz:
    def test_random_chunk_granularities(self):
        """The streaming Decompressor must produce identical output to
        the batch decoder when fed random-sized chunks (the reference
        proves 4096/1-byte; this covers arbitrary granularities and
        chunk boundaries landing inside headers, size words, checksums,
        and sequences)."""
        rng = np.random.default_rng(99)
        payload = (b"stream fuzz corpus " * 1500
                   + bytes(rng.integers(0, 256, 9000, dtype=np.uint8)))
        blob = (lz4tpu.compress(payload, block_max_code=4,
                                block_checksum=True)
                + lz4tpu.compress(payload[:300], frame_format="legacy")
                + lz4tpu.compress(b""))
        want = payload + payload[:300]
        arr = np.frombuffer(blob, np.uint8)
        for trial in range(6):
            ctx = lz4tpu.Decompressor()
            out = bytearray()
            pos = 0
            stall = 0
            while pos < arr.size and stall < 8:
                n = int(rng.integers(1, 97))
                got, chunk = ctx.update(arr[pos:pos + n])
                out += chunk
                pos += got
                stall = stall + 1 if got == 0 else 0
            assert bytes(out) == want, trial


class TestCorruptionParity:
    """Random corruptions: the device pipeline must match the host
    engine outcome exactly — same bytes, or same exception class and
    byte-identical diagnostic message."""

    def test_bit_flips(self):
        rng = np.random.default_rng(13)
        payload = (b"differential corruption corpus " * 2000
                   + bytes(rng.integers(0, 256, 20_000, dtype=np.uint8)))
        blob = bytearray(lz4tpu.compress(payload))
        mismatches = []
        for trial in range(40):
            pos = int(rng.integers(0, len(blob)))
            bit = 1 << int(rng.integers(0, 8))
            blob[pos] ^= bit
            h = _decode_outcome(bytes(blob), "host")
            d = _decode_outcome(bytes(blob), "device")
            if h != d:
                mismatches.append((trial, pos, bit, h[:1], d[:1]))
            blob[pos] ^= bit  # restore
        assert not mismatches, mismatches

    def test_truncations(self):
        payload = b"truncation corpus " * 3000
        blob = lz4tpu.compress(payload)
        for cut in (1, 6, 7, 11, len(blob) // 2, len(blob) - 1):
            h = _decode_outcome(blob[:cut], "host")
            d = _decode_outcome(blob[:cut], "device")
            assert h == d, (cut, h[:1], d[:1])
