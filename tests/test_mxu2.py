"""v2 MXU routing decoder: pack-time per-byte provenance resolution.

Oracle testing mirrors the reference's vector strategy (SURVEY.md §4):
every pack decodes bit-exactly against the host engine, which the
vector suite pins to the reference.  The compiled kernel runs on TPU;
CPU CI exercises the same kernel through the Pallas interpreter.
"""

import numpy as np
import pytest

import lz4tpu
from lz4tpu import FOR_ALL
from lz4tpu.device import mxu2
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table


def _pack_of(data: bytes, chain_ranges=None) -> tuple:
    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    table = build_seq_table(buf, parsed, FOR_ALL, data)
    pack = mxu2.pack_dense2(
        table.lit_len, table.match_len, table.match_off, table.lit_src,
        buf, chain_ranges=chain_ranges,
    )
    return pack, table


def _roundtrip(payload: bytes, **kw) -> None:
    data = lz4tpu.compress(payload, **kw)
    pack, table = _pack_of(data)
    got = b"".join(seg for _c, seg in mxu2.decode_dense2(pack, interpret=True))
    assert got == payload


class TestPackResolution:
    def test_code_kinds_partition(self):
        rng = np.random.default_rng(0)
        payload = (b"abcdef" * 3000
                   + rng.integers(0, 256, 4000, dtype=np.uint8).tobytes())
        data = lz4tpu.compress(payload)
        pack, table = _pack_of(data)
        code = pack.code.reshape(-1)[: table.n_out]
        is_ring = (code >> 16) & 1
        # ring sources always point before their own substep
        j = np.arange(table.n_out)
        src = code & 0xFFFF
        sub_base = j & ~(mxu2.SUB - 1)
        ring_j = j[is_ring == 1]
        # mod-64Ki distance from the substep base is always within 64Ki
        dist = (sub_base[ring_j] - src[is_ring == 1]) & 0xFFFF
        assert (dist > 0).all() or ring_j.size == 0
        # value bytes reproduce the payload directly where literal
        vals = (code >> 17) & 255
        out = np.frombuffer(payload, np.uint8)
        mask = is_ring == 0
        assert np.array_equal(vals[mask], out[: table.n_out][mask])

    def test_self_overlap_rle(self):
        # offset-1 RLE: every byte chains to the substep's first literal
        _roundtrip(b"\x05" + b"\x00" * 50000 + b"tail")

    def test_small_offsets(self):
        pat = b"abcdefg"  # offset-7 chains, thousands of hops
        _roundtrip(pat * 9000)

    def test_far_offsets(self):
        rng = np.random.default_rng(1)
        block = rng.integers(0, 256, 60000, dtype=np.uint8).tobytes()
        _roundtrip(block + b"x" * 100 + block)  # ~60 KiB back-references

    def test_multi_chain_ranges(self):
        rng = np.random.default_rng(2)
        payload = (b"chain one text " * 800
                   + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes())
        data = lz4tpu.compress(payload, block_max_code=4,
                               block_independence=True)
        buf = np.frombuffer(data, np.uint8)
        parsed = parse_frames(buf, FOR_ALL)
        table = build_seq_table(buf, parsed, FOR_ALL, data)
        ranges = [(s.seq_lo, s.seq_hi) for s in table.spans]
        pack = mxu2.pack_dense2(
            table.lit_len, table.match_len, table.match_off,
            table.lit_src, buf, chain_ranges=ranges,
        )
        assert len(pack.out_spans) == len(ranges)
        got = b"".join(
            seg for _c, seg in mxu2.decode_dense2(pack, interpret=True)
        )
        assert got == payload

    def test_empty_chain(self):
        pack = mxu2.pack_dense2(
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.ones(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.uint8),
        )
        assert pack.n_sub == 0
        assert mxu2.decode_dense2(pack) == [(0, b"")]


class TestNativePack:
    def test_matches_numpy_resolver(self):
        from lz4tpu import native

        if not native.available():
            pytest.skip("native engine unavailable")
        rng = np.random.default_rng(7)
        payload = (b"native/numpy pack equivalence " * 2500
                   + bytes([rng.integers(0, 256)]) * 40000
                   + rng.integers(0, 256, 20000, dtype=np.uint8).tobytes())
        data = lz4tpu.compress(payload)
        buf = np.frombuffer(data, np.uint8)
        parsed = parse_frames(buf, FOR_ALL)
        t = build_seq_table(buf, parsed, FOR_ALL, data)
        code_c, n_c = native.pack_dense2_chain(
            buf, t.lit_len, t.lit_src, t.match_len, t.match_off)
        code_py, n_py = mxu2._pack_chain(
            t.lit_len, t.lit_src, t.match_len, t.match_off, buf)
        assert n_c == n_py == t.n_out
        assert np.array_equal(code_c, code_py)


class TestIndependenceFlagLies:
    def test_linked_stream_with_indep_flag(self):
        # The reference ignores B.Indep and always keeps history
        # (SURVEY.md §2).  A stream whose flag lies (set, but matches
        # cross block boundaries) must still decode bit-exactly: the
        # pipeline demotes the frame to one linked chain.
        from lz4tpu.xxh32 import xxh32

        payload = b"cross-block history reference payload! " * 4000
        data = bytearray(lz4tpu.compress(
            payload, block_max_code=4, block_independence=False,
            content_checksum=False,
        ))
        assert not data[4] & 0x20
        data[4] |= 0x20                      # lie: claim independence
        # descriptor = FLG..BD (no content size); HC = byte 1 of xxh32
        data[6] = (xxh32(bytes(data[4:6])) >> 8) & 0xFF
        fixed = bytes(data)
        assert lz4tpu.decompress(fixed) == payload          # host engine
        from lz4tpu.pipeline import decompress_device

        assert decompress_device(fixed, interpret=True) == payload


class TestKernelFuzz:
    @pytest.mark.parametrize("seed", range(4))
    def test_mixed_payload(self, seed):
        rng = np.random.default_rng(seed)
        parts = []
        for _ in range(rng.integers(2, 6)):
            kind = rng.integers(0, 3)
            n = int(rng.integers(1, 30000))
            if kind == 0:
                parts.append(bytes([rng.integers(0, 256)]) * n)
            elif kind == 1:
                parts.append(rng.integers(0, 256, n, np.uint8).tobytes())
            else:
                word = rng.integers(0, 256, rng.integers(2, 40),
                                    np.uint8).tobytes()
                parts.append((word * (n // len(word) + 1))[:n])
        _roundtrip(b"".join(parts))

    def test_vector_t100k(self, vectors_dir):
        data = (vectors_dir / "t100k.lz4").read_bytes()
        ref = (vectors_dir / "t100k.bin").read_bytes()
        pack, table = _pack_of(data)
        got = b"".join(
            seg for _c, seg in mxu2.decode_dense2(pack, interpret=True)
        )
        assert got == ref


class TestPartedDecode:
    def test_parts_match_single_launch(self):
        rng = np.random.default_rng(8)
        payload = (b"parted decode payload " * 6000
                   + rng.integers(0, 256, 30000, dtype=np.uint8).tobytes())
        data = lz4tpu.compress(payload)
        pack, table = _pack_of(data)
        assert pack.n_sub >= 8
        whole = mxu2.decode_dense2_rows(pack, interpret=True)
        parted = mxu2.decode_dense2_rows(pack, interpret=True, part_subs=3)
        assert np.array_equal(whole, parted)
        assert parted[: table.n_out].tobytes() == payload


class TestParallelPack:
    def test_threads_bit_identical(self):
        """The parallel resolver (substep-aligned ranges on worker
        threads) must produce bit-identical codes to the serial one for
        every engine-relevant shape, including ranges that start
        mid-literal, mid-match, and inside multi-wrap ring fills."""
        from lz4tpu import native
        if not native.available():
            pytest.skip("native engine unavailable")
        rng = np.random.default_rng(77)
        words = [b"aa", b"bb", b"cc", b"dd"]
        text = b" ".join(words[int(rng.integers(0, 4))] for _ in range(60_000))
        pat = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        payloads = [
            text,                                    # short matches
            text[:5000] + pat * 90 + text[:5000],    # multi-wrap match
            b"x" * 300_000,                          # off=1 inherit runs
            (b"pqrstuv" * 50_000),                   # small-off runs
            bytes(rng.integers(0, 256, 64, dtype=np.uint8)) + text[:200_000],
        ]
        import lz4tpu.pipeline as pl
        for pi, payload in enumerate(payloads):
            data = lz4tpu.compress(payload)
            buf = np.frombuffer(data, np.uint8)
            parsed = pl.parse_frames(buf)
            t = pl.build_seq_table(buf, parsed, pl.Reservation.SZ_8_MIB, buf)
            serial, n1 = native.pack_dense2_chain(
                buf, t.lit_len, t.lit_src, t.match_len, t.match_off,
                threads=1)
            for nt in (2, 3, 7):
                par, n2 = native.pack_dense2_chain(
                    buf, t.lit_len, t.lit_src, t.match_len, t.match_off,
                    threads=nt)
                assert n1 == n2 and np.array_equal(serial, par), (pi, nt)


class TestLongRingFills:
    def test_match_spanning_multiple_64k_wraps(self):
        """Regression: a single match longer than 128 KiB at offset >=
        2048 produces a ring fill whose mod-64Ki positions wrap more
        than once; the run-level native resolver must mask every wrap
        (it once leaked bit 17 into the known-value field, silently
        corrupting dense decode)."""
        rng = np.random.default_rng(21)
        words = [b"alpha", b"bravo", b"charlie", b"delta"]
        text = b" ".join(words[int(rng.integers(0, 4))] for _ in range(8000))
        pattern = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        payload = text + pattern * 60          # one ~240 KiB match, off=4096
        data = lz4tpu.compress(payload, content_checksum=True)
        pack, table = _pack_of(data)
        # native must stay bit-identical to the numpy resolver
        import lz4tpu.frame as fr
        import lz4tpu.pipeline as pl
        buf = np.frombuffer(data, np.uint8)
        parsed = fr.parse_frames(buf)
        tbl = pl.build_seq_table(buf, parsed, pl.Reservation.SZ_8_MIB, buf)
        code_np, n_np = mxu2._pack_chain(
            tbl.lit_len, tbl.lit_src, tbl.match_len, tbl.match_off, buf
        )
        assert np.array_equal(pack.code.reshape(-1)[:n_np], code_np)
        # and the kernel must decode it bit-exactly
        flat = mxu2.decode_dense2_rows(pack, interpret=True)
        assert flat[: table.n_out].tobytes() == payload


class TestRingChaining:
    def test_ring_carry(self):
        # Split one chain's substeps across two kernel launches: the
        # second launch must seed its ring with the first's final state
        # (the device analog of retained history across Update calls).
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        payload = (b"ring carry payload " * 4000
                   + rng.integers(0, 256, 20000, dtype=np.uint8).tobytes())
        data = lz4tpu.compress(payload)
        pack, table = _pack_of(data)
        assert pack.n_sub >= 4
        cut = pack.n_sub // 2
        rows1, ring = mxu2._decode_dense2_device(
            jnp.asarray(pack.code[:cut]), jnp.asarray(pack.scal[:cut]),
            n_sub=cut, interpret=True,
        )
        rows2, _ = mxu2._decode_dense2_device(
            jnp.asarray(pack.code[cut:]), jnp.asarray(pack.scal[cut:]),
            ring, n_sub=pack.n_sub - cut, interpret=True,
        )
        flat = np.concatenate([
            np.asarray(jax.device_get(rows1)).reshape(-1),
            np.asarray(jax.device_get(rows2)).reshape(-1),
        ])
        assert flat[: table.n_out].tobytes() == payload
