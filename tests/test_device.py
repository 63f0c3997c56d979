"""Device pipeline tests (virtual CPU backend).

The batched pipeline (host parse -> sequence table -> device resolve)
must be bit-exact with the streaming host engine on every vector and
raise the same reference-parity errors on every corruption vector.
"""

import numpy as np
import pytest

from lz4tpu import Lz4Error, Reservation, compress, decompress_host
from lz4tpu.pipeline import decompress_device
from conftest import error_vector_names, good_vector_names


@pytest.mark.parametrize("name", good_vector_names())
def test_device_matches_reference(vectors_dir, name):
    data = (vectors_dir / f"{name}.lz4").read_bytes()
    ref = (vectors_dir / f"{name}.bin").read_bytes()
    assert decompress_device(data) == ref


def test_device_z9m(vectors_dir):
    data = (vectors_dir / "z9m.lz4").read_bytes()
    out = decompress_device(data)
    assert len(out) == 9437166 and out == b"\x00" * len(out)


@pytest.mark.parametrize("name", error_vector_names())
def test_device_error_parity(vectors_dir, name):
    data = (vectors_dir / f"{name}.err").read_bytes()
    declared = (vectors_dir / f"{name}.eds").read_text().splitlines()[0]
    with pytest.raises(Lz4Error) as exc_info:
        decompress_device(data, Reservation.SINGLE_FRAME)
    assert exc_info.value.ada_image() == declared


def test_device_round_trip_own_encoder():
    payload = (b"The quick brown fox. " * 3000) + bytes(range(256)) * 40
    frame = compress(payload, block_max_code=4, block_checksum=True)
    assert decompress_device(frame) == payload


def test_device_deep_chain():
    """A pathological chain: every sequence copies from the previous
    one, depth ~ number of sequences. Exercises the doubling re-entry
    path."""
    # repeated pattern with short period so matches chain tightly
    payload = bytes([i % 7 for i in range(100_000)])
    frame = compress(payload, block_max_code=4)
    assert decompress_device(frame) == payload
    assert decompress_host(frame) == payload
