"""Error-parity suite: every corruption vector must raise the same
exception class with the byte-identical message the reference raises.

Mirrors the reference error driver (reference:
test_suite/lz4test.adb:280-344): whole file offered via
``from_header(..., SINGLE_FRAME)`` + update loop; the rendered
``raised LZ4ADA.<NAME> : <message>`` line must equal the first line of
the ``.eds`` file. Also replicates the two coded error tests
(lz4test.adb:353-430).
"""

import numpy as np
import pytest

from lz4tpu import (
    DataCorruption,
    Decompressor,
    Lz4Error,
    Reservation,
    TooLittleMemory,
)
from conftest import error_vector_names


def _drive_error_case(data: bytes) -> None:
    """Feed the whole buffer; an Lz4Error must fire before it is consumed."""
    arr = np.frombuffer(data, dtype=np.uint8)
    ctx, consumed = Decompressor.from_header(arr, Reservation.SINGLE_FRAME)
    while consumed < arr.size:
        got, _out = ctx.update(arr[consumed:])
        assert got > 0, "no progress and no exception in an error case"
        consumed += got
    raise AssertionError("error vector fully decoded without an exception")


@pytest.mark.parametrize("name", error_vector_names())
def test_error_vector_message_parity(vectors_dir, name):
    data = (vectors_dir / f"{name}.err").read_bytes()
    declared = (vectors_dir / f"{name}.eds").read_text().splitlines()[0]
    with pytest.raises(Lz4Error) as exc_info:
        _drive_error_case(data)
    assert exc_info.value.ada_image() == declared


def test_reservation_exceeded(vectors_dir):
    """SZ_64_KiB context refusing a 1 MiB-block frame
    (reference: lz4test.adb:353-382)."""
    data = (vectors_dir / "z2841.lz4").read_bytes()  # BD code 6 = 1 MiB
    arr = np.frombuffer(data[:20], dtype=np.uint8)
    ctx = Decompressor(Reservation.SZ_64_KIB)
    with pytest.raises(TooLittleMemory) as exc_info:
        pos = 0
        for _ in range(8):
            got, _out = ctx.update(arr[pos:])
            pos += got
    assert exc_info.value.ada_image() == (
        "raised LZ4ADA.TOO_LITTLE_MEMORY : LZ4 header requres reservation "
        "SZ_1_MIB, but API call requested that only SZ_64_KIB be used. "
        "This frame cannot be processed under the given constraints."
    )


def test_multi_frame_rejected_in_single_frame_mode(vectors_dir):
    """Concatenated frames must be refused under SINGLE_FRAME policy
    (reference: lz4test.adb:384-430)."""
    data = (vectors_dir / "concat390.lz4").read_bytes()
    with pytest.raises(DataCorruption) as exc_info:
        _drive_error_case(data)
    assert "Single_Frame" in str(exc_info.value)


def test_single_frame_ok_on_single_frame_input(vectors_dir):
    """SINGLE_FRAME must still decode exactly one frame fine."""
    data = (vectors_dir / "t389.lz4").read_bytes()
    ref = (vectors_dir / "t389.bin").read_bytes()
    arr = np.frombuffer(data, dtype=np.uint8)
    ctx, consumed = Decompressor.from_header(arr, Reservation.SINGLE_FRAME)
    out = bytearray()
    while consumed < arr.size:
        got, produced = ctx.update(arr[consumed:])
        out += produced
        consumed += got
    assert bytes(out) == ref
