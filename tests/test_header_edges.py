"""Header-edge parity cases the shipped vectors don't cover.

Reference behavior being pinned:
  - dictionary-ID flag (FLG bit 0): the reference consumes the 4-byte
    dict-ID inside the header (checksum covers it) and decodes the
    frame normally without a dictionary (lz4ada.adb:272,292); streams
    whose matches would actually need the dictionary fail the backref
    range check instead.
  - all sixteen skippable-frame magics 0x184D2A50..5F
    (lz4ada.ads:348-353).
  - dict-ID and content-size together shift the header layout by 12
    bytes total before the checksum byte.
"""

import struct

import numpy as np
import pytest

import lz4tpu
from lz4tpu.xxh32 import xxh32
from lz4tpu import frame as fr


def _block_body(payload: bytes) -> bytes:
    blob = lz4tpu.compress(payload)
    b0 = fr.parse_frames(np.frombuffer(blob, np.uint8)).frames[0].blocks[0]
    assert b0.is_compressed
    return blob[b0.comp_off:b0.comp_off + b0.comp_len]


def _modern_frame(body: bytes, *, dict_id: int | None = None,
                  content_size: int | None = None) -> bytes:
    flg = 1 << 6
    desc = b""
    if content_size is not None:
        flg |= 8
        desc += struct.pack("<Q", content_size)
    if dict_id is not None:
        flg |= 1
        desc += struct.pack("<I", dict_id)
    desc = bytes([flg, 4 << 4]) + desc
    return (struct.pack("<I", 0x184D2204) + desc
            + bytes([(xxh32(desc) >> 8) & 0xFF])
            + struct.pack("<I", len(body)) + body
            + struct.pack("<I", 0))


PAYLOAD = b"header edge case payload " * 40


class TestDictionaryFlag:
    def test_dict_id_frame_decodes_all_paths(self):
        blob = _modern_frame(_block_body(PAYLOAD), dict_id=0xCAFEBABE)
        assert lz4tpu.decompress(blob, backend="host") == PAYLOAD
        assert lz4tpu.decompress(blob, backend="device") == PAYLOAD
        ctx = lz4tpu.Decompressor()
        arr = np.frombuffer(blob, np.uint8)
        out = bytearray()
        pos = 0
        stall = 0
        while pos < arr.size and stall < 6:
            got, chunk = ctx.update(arr[pos:pos + 1])
            out += chunk
            pos += got
            stall = stall + 1 if got == 0 else 0
        assert bytes(out) == PAYLOAD

    def test_dict_id_with_content_size(self):
        blob = _modern_frame(_block_body(PAYLOAD), dict_id=7,
                             content_size=len(PAYLOAD))
        assert lz4tpu.decompress(blob) == PAYLOAD
        assert lz4tpu.decompress(blob, backend="device") == PAYLOAD

    def test_dict_id_header_checksum_still_enforced(self):
        blob = bytearray(_modern_frame(_block_body(PAYLOAD), dict_id=7))
        blob[7] ^= 0xFF  # corrupt a dict-id byte under the checksum
        with pytest.raises(lz4tpu.Lz4Error):
            lz4tpu.decompress(bytes(blob))


class TestSkippableMagics:
    @pytest.mark.parametrize("low", range(16))
    def test_all_sixteen_magics(self, low):
        payload = b"after the skippable frame"
        skip = struct.pack("<II", 0x184D2A50 + low, 11) + b"x" * 11
        blob = skip + lz4tpu.compress(payload)
        assert lz4tpu.decompress(blob, backend="host") == payload
        ctx_out = lz4tpu.decompress(blob, backend="device")
        assert ctx_out == payload
