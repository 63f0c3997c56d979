"""Randomized differential soak: fresh-seed payloads through every
encoder level/backend and both decode engines, plus random corruption
error-parity (host oracle vs device pipeline).  Not part of the fixed
pytest suite (which is deterministic); run ad hoc:

    PYTHONPATH=/root/repo python exp/soak.py [seconds]
"""

import os
import random
import sys
import time

import numpy as np

import lz4tpu
from lz4tpu.errors import Lz4Error


def payload(rng: np.random.Generator) -> bytes:
    kind = rng.integers(0, 6)
    n = int(rng.integers(1, 400_000))
    if kind == 0:
        return bytes(n)
    if kind == 1:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 2:                 # fragment shuffle (text-like reuse)
        frags = [rng.integers(0, 256, int(rng.integers(4, 80)),
                              dtype=np.uint8).tobytes()
                 for _ in range(24)]
        return b"".join(frags[int(rng.integers(0, 24))]
                        for _ in range(n // 20 + 1))[:n]
    if kind == 3:                 # runs with period
        period = int(rng.integers(1, 300))
        pat = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
        return (pat * (n // period + 1))[:n]
    if kind == 4:                 # mixed zero/random stripes
        parts = []
        left = n
        while left > 0:
            k = int(rng.integers(1, 70_000))
            k = min(k, left)
            parts.append(bytes(k) if rng.integers(0, 2)
                         else rng.integers(0, 256, k, dtype=np.uint8)
                         .tobytes())
            left -= k
        return b"".join(parts)
    return bytes(int(rng.integers(0, 256)) for _ in range(min(n, 64)))


def one_round(rng: np.random.Generator, seed: int) -> None:
    data = payload(rng)
    kw = dict(
        block_max_code=int(rng.choice([4, 5, 6, 7])),
        block_checksum=bool(rng.integers(0, 2)),
        content_checksum=bool(rng.integers(0, 2)),
        block_independence=bool(rng.integers(0, 2)),
        level=int(rng.choice([1, 4, 6, 10])),
    )
    frame = lz4tpu.compress(data, **kw)
    assert lz4tpu.decompress_host(frame) == data, f"host seed={seed}"
    assert lz4tpu.decompress(frame, backend="device") == data, \
        f"device seed={seed} kw={kw}"
    # streaming compressor parity on a random chunking
    c = lz4tpu.Compressor(**kw)
    step = int(rng.integers(1, max(2, len(data))))
    out = bytearray()
    for i in range(0, len(data), step):
        out += c.update(data[i:i + step])
    out += c.finish()
    assert bytes(out) == frame, f"stream seed={seed}"
    # caller-owned buffer parity: update_into with a random chunking
    # and a randomly oversized buffer must reproduce update() exactly
    ctx, consumed = lz4tpu.Decompressor.from_header(frame)
    buf = bytearray(ctx.min_buffer_size + int(rng.integers(0, 4096)))
    arr = np.frombuffer(frame, np.uint8)[consumed:]
    step2 = int(rng.integers(1, max(2, arr.size)))
    got = bytearray()
    pos = 0
    stall = 0
    while pos < arr.size:
        c2, first, last = ctx.update_into(arr[pos:pos + step2], buf)
        if last >= first:
            got += bytes(memoryview(buf)[first:last + 1])
        pos += c2
        if c2 == 0:
            step2 = arr.size        # stalled on a chunk boundary:
            stall += 1              # offer the whole remaining tail
            assert stall < 5, f"update_into stall seed={seed}"
        else:
            stall = 0
    assert bytes(got) == data, f"update_into seed={seed}"
    # corruption parity: flip one byte, compare host vs device outcome
    if len(frame) > 12:
        bad = bytearray(frame)
        pos = int(rng.integers(4, len(bad)))
        bad[pos] ^= int(rng.integers(1, 256))
        bad = bytes(bad)
        try:
            h = ("ok", lz4tpu.decompress_host(bad))
        except Lz4Error as e:
            h = ("err", type(e).__name__, str(e))
        except MemoryError:
            h = ("mem",)
        try:
            d = ("ok", lz4tpu.decompress(bad, backend="device"))
        except Lz4Error as e:
            d = ("err", type(e).__name__, str(e))
        except MemoryError:
            d = ("mem",)
        assert h == d, f"fault parity seed={seed} pos={pos}: {h[:2]} vs {d[:2]}"
    # truncation parity
    if len(frame) > 8:
        cut = int(rng.integers(1, len(frame)))
        t = frame[:cut]
        try:
            h = ("ok", lz4tpu.decompress_host(t))
        except Lz4Error as e:
            h = ("err", type(e).__name__, str(e))
        try:
            d = ("ok", lz4tpu.decompress(t, backend="device"))
        except Lz4Error as e:
            d = ("err", type(e).__name__, str(e))
        assert h == d, f"truncation parity seed={seed} cut={cut}: " \
                       f"{h[:2]} vs {d[:2]}"


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    t0 = time.time()
    n = 0
    base = int.from_bytes(os.urandom(4), "little")
    while time.time() - t0 < budget:
        seed = base + n
        one_round(np.random.default_rng(seed), seed)
        n += 1
        if n % 20 == 0:
            print(f"{n} rounds, {time.time() - t0:.0f}s", flush=True)
    print(f"soak OK: {n} rounds in {time.time() - t0:.0f}s (base seed "
          f"{base})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
