"""Direct branch coverage of the pure-Python block oracle
(`lz4tpu.block.decode_block_ring_py`) — the exact-semantics fallback
that produces contract-exact diagnostics when the native engine
reports a failure (reference grammar: lib/lz4ada.adb:716-904).

Every malformed case is also run through the public
`decode_block_ring` (native engine + oracle fallback) and must raise
the identical message, pinning the native/oracle agreement the
fallback depends on.
"""

import numpy as np
import pytest

from lz4tpu.block import decode_block, decode_block_ring, decode_block_ring_py
from lz4tpu.errors import DataCorruption


def _u8(b: bytes) -> np.ndarray:
    return np.frombuffer(b, np.uint8)


def _both_raise(src: bytes, out_pos: int = 0, hist: int = 0) -> str:
    """Run oracle and public path; both must raise DataCorruption with
    the same message.  Returns the message."""
    buf1 = np.zeros(1 << 17, np.uint8)
    with pytest.raises(DataCorruption) as e1:
        decode_block_ring_py(_u8(src), buf1, out_pos, hist)
    buf2 = np.zeros(1 << 17, np.uint8)
    with pytest.raises(DataCorruption) as e2:
        decode_block_ring(_u8(src), buf2, out_pos, hist)
    assert str(e1.value) == str(e2.value)
    return str(e1.value)


def test_truncated_literal_length_extension():
    # token 0xF0: literal len 15 + extension, but the block ends
    msg = _both_raise(b"\xf0")
    assert "length" in msg.lower()


def test_literals_missing_match_nibble_zero():
    # token 0x50: five literals claimed, only two present, no match part
    msg = _both_raise(b"\x50ab")
    assert "literal" in msg.lower() or "Literal" in msg


def test_literals_missing_match_nibble_set():
    # literals overrun AND a match nibble: the reference only fails at
    # the match-after-literals check (lz4ada.adb:752-764)
    _both_raise(b"\x52ab")


def test_match_after_literals_at_block_end():
    # one literal then end with a match nibble: the match-after-
    # literals diagnostic (lz4ada.adb:752-764)
    msg = _both_raise(b"\x12a")
    assert "Match_Length" in msg


def test_offset_bytes_missing():
    # a match nibble with only ONE byte left for the 2-byte offset
    msg = _both_raise(b"\x12ab")
    assert "offset" in msg.lower()


def test_offset_zero():
    msg = _both_raise(b"\x14a\x00\x00")
    assert "0" in msg


def test_backref_out_of_range():
    # first sequence: 1 literal, then a match at offset 100 with no
    # history -> reads before the start
    msg = _both_raise(b"\x14a\x64\x00")
    assert msg  # reference-exact text pinned by test_errors.py vectors


def test_truncated_match_length_extension():
    # match nibble 15 requires extension bytes after the offset
    msg = _both_raise(b"\x1fa\x01\x00")
    assert "length" in msg.lower()


def test_history_read_across_ring_wrap():
    # Decode a block at out_pos=0 with out_pos_history=32: a match at
    # offset 8 from op=4 reads the previous region's tail.
    buf = np.zeros(1 << 17, np.uint8)
    buf[24:32] = _u8(b"HISTORY!")
    # 4 literals "abcd", then match offset 8 len 4: sources are
    # positions -4..-1 -> history 28..31 ("ORY!")
    end = decode_block_ring_py(_u8(b"\x40abcd\x08\x00"), buf, 0, 32)
    assert bytes(buf[:end]) == b"abcdORY!"
    buf2 = np.zeros(1 << 17, np.uint8)
    buf2[24:32] = _u8(b"HISTORY!")
    end2 = decode_block_ring(_u8(b"\x40abcd\x08\x00"), buf2, 0, 32)
    assert end2 == end and bytes(buf2[:end2]) == b"abcdORY!"


def test_overlap_replay_doubling():
    # RLE: 1 literal then a 30-byte match at offset 1
    src = b"\x1fz\x01\x00\x0b"
    got = decode_block(_u8(src), max_out=64)
    assert got == b"z" * 31


def test_output_exceeds_buffer_on_literals():
    buf = np.zeros(8, np.uint8)
    with pytest.raises(DataCorruption) as e:
        decode_block_ring_py(_u8(b"\x90abcdefghi"), buf, 0, 0)
    assert "maximum block size" in str(e.value)


def test_output_exceeds_buffer_on_match():
    buf = np.zeros(8, np.uint8)
    with pytest.raises(DataCorruption) as e:
        decode_block_ring_py(_u8(b"\x4fabcd\x04\x00\x10"), buf, 0, 0)
    assert "maximum block size" in str(e.value)


def test_literal_only_block_legal_end():
    assert decode_block(_u8(b"\x30xyz"), max_out=16) == b"xyz"
