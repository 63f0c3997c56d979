"""Pallas segment-copy kernel tests (interpret mode on CPU).

Interpret mode executes the same kernel logic op-by-op, so these cover
the alignment/masking/overlap algebra; the compiled path is exercised
on real TPU hardware by bench.py and the verification flow.
"""

import numpy as np
import pytest

from lz4tpu import compress
from lz4tpu.device.xxh32_pallas import xxh32_device
from lz4tpu.pipeline import decompress_device
from lz4tpu.xxh32 import xxh32

RNG = np.random.default_rng(42)


@pytest.mark.parametrize(
    "payload",
    [
        b"Hello, world. Hello, world. Hello, world.",
        b"\x00" * 5000,                                   # RLE / overlap
        b"abcdefgh" * 300,                                # period 8
        b"abc" * 2000,                                    # period 3 overlap
        bytes(RNG.integers(0, 4, 8000, dtype=np.uint8)),  # low entropy
        b"x" + b"ab" * 40 + bytes(range(200)) * 3 + b"ab" * 500,
        bytes(RNG.integers(0, 256, 3000, dtype=np.uint8)),  # stored block
    ],
    ids=["hello", "zeros", "p8", "p3", "lowent", "mixed", "stored"],
)
@pytest.mark.parametrize("indep", [False, True], ids=["linked", "indep"])
def test_pallas_engine_round_trip(payload, indep):
    frame = compress(payload, block_max_code=4, block_independence=indep,
                     block_checksum=True)
    out = decompress_device(frame, engine="pallas", interpret=True)
    assert out == payload


def test_pallas_engine_small_vectors(vectors_dir):
    for name in ["t2", "t389", "z100", "concat390", "z101legacyplus",
                 "skipz100", "hellolegacy", "emptycraft"]:
        data = (vectors_dir / f"{name}.lz4").read_bytes()
        ref = (vectors_dir / f"{name}.bin").read_bytes()
        assert decompress_device(data, engine="pallas", interpret=True) == ref, name


@pytest.mark.parametrize("n", [0, 5, 16, 31, 100, 4096, 10000])
def test_xxh32_device_kernel(n):
    data = RNG.integers(0, 256, n).astype(np.uint8)
    assert xxh32_device(data, interpret=True) == xxh32(data.tobytes())
