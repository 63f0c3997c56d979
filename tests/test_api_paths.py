"""Coverage for api.py paths the vector suite misses: the batch host
decoder's output-buffer growth, the streaming fallback's mid-frame EOF
diagnostic, and the explicit backend="device" entry."""

import numpy as np
import pytest

import lz4tpu
from lz4tpu.errors import DataCorruption


def test_batch_host_grows_output_buffer():
    # No content size in the header -> the batch decoder starts from a
    # reservation-derived cap and must grow while decoding (both the
    # compressed-block and uncompressed-block growth paths).
    rng = np.random.default_rng(5)
    payload = (bytes(2_000_000)                       # compressible
               + rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes())
    frame = lz4tpu.compress(payload, block_max_code=4)
    assert frame[4] & 0x08 == 0                       # no content size
    assert lz4tpu.decompress_host(frame) == payload


def test_truncated_frame_mid_stream_diagnostic():
    V = "/root/reference/test_vectors_lz4"
    data = open(f"{V}/t389.lz4", "rb").read()
    with pytest.raises(DataCorruption):
        lz4tpu.decompress(data[:len(data) // 2])


def test_backend_device_explicit():
    V = "/root/reference/test_vectors_lz4"
    data = open(f"{V}/t389.lz4", "rb").read()
    ref = open(f"{V}/t389.bin", "rb").read()
    assert lz4tpu.decompress(data, backend="device") == ref
