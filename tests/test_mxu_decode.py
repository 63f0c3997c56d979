"""Tests for the MXU one-hot routing decoder (device/mxu_decode.py).

Oracle: byte-by-byte LZ4 sequence semantics (literal append, then
match_len single-byte copies from offset back — the same contract as
the reference's Decompress_Sequence, lib/lz4ada.adb:716-788).
"""

import numpy as np
import pytest

import jax

from lz4tpu.device import mxu_decode as mx


def simulate(seqs, chain_bounds=None):
    """seqs: list of (lit_bytes, match_len, match_off). Returns per-chain
    outputs with byte-by-byte match semantics."""
    bounds = chain_bounds or [0, len(seqs)]
    outs = []
    for c in range(len(bounds) - 1):
        out = bytearray()
        for (lits, ml, off) in seqs[bounds[c]:bounds[c + 1]]:
            out += lits
            for _ in range(ml):
                out.append(out[len(out) - off])
        outs.append(bytes(out))
    return outs


def pack_from_seqs(seqs, chain_bounds=None):
    ll = np.array([len(s[0]) for s in seqs], np.int32)
    ml = np.array([s[1] for s in seqs], np.int32)
    off = np.array([max(s[2], 1) for s in seqs], np.int32)
    lits = [np.frombuffer(bytes(s[0]), np.uint8) if len(s[0]) else b""
            for s in seqs]
    return mx.pack_dense(ll, ml, off, lits, chain_bounds)


def roundtrip(seqs, chain_bounds=None, interpret=True):
    pack = pack_from_seqs(seqs, chain_bounds)
    got = mx.decode_dense(pack, interpret=interpret)
    want = simulate(seqs, chain_bounds)
    for (c, data), w in zip(got, want):
        assert data == w, (
            f"chain {c}: {len(data)} vs {len(w)} bytes; "
            f"first diff at {next((k for k in range(min(len(data), len(w))) if data[k] != w[k]), -1)}"
        )


ON_TPU = jax.devices()[0].platform != "cpu"
INTERP = not ON_TPU


class TestPacker:
    def test_exact_substeps(self):
        seqs = [(b"a" * 100, 0, 1)] * 50
        pack = pack_from_seqs(seqs)
        assert pack.tbl.shape[1] == mx.SLOTS
        # every substep sums to SUB bytes
        ll = pack.tbl & 0xFF
        ml = (pack.tbl >> 8) & 0x7F
        assert ((ll + ml).sum(axis=1) == mx.SUB).all()

    def test_long_runs_split(self):
        seqs = [(b"x" * 1000, 0, 1), (b"", 5000, 3)]
        pack = pack_from_seqs(seqs)
        ll = pack.tbl & 0xFF
        ml = (pack.tbl >> 8) & 0x7F
        assert ll.max() <= 255 and ml.max() <= 127

    def test_out_spans(self):
        seqs = [(b"ab", 10, 2), (b"c", 0, 1)]
        pack = pack_from_seqs(seqs)
        assert pack.out_spans[0][3] == 13


class TestDecodeSmall:
    """Small cases; interpret mode on CPU, compiled on TPU."""

    def test_pure_literals(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
        roundtrip([(data, 0, 1)], interpret=INTERP)

    def test_far_match(self):
        lits = bytes(range(200))
        roundtrip([(lits, 0, 1), (b"XYZ", 150, 180)], interpret=INTERP)

    def test_overlap_rle(self):
        roundtrip([(b"Q", 300, 1)], interpret=INTERP)

    def test_overlap_period3(self):
        roundtrip([(b"abc", 100, 3)], interpret=INTERP)

    def test_self_substep_refs(self):
        # matches that land within the same 2048-byte substep
        seqs = [(b"0123456789abcdef", 0, 1)]
        for _ in range(40):
            seqs.append((b"", 16, 16))   # chains of copies of the last 16B
        roundtrip(seqs, interpret=INTERP)

    def test_cross_substep_refs(self):
        # fill > 1 substep, then reference far back across the boundary
        base = bytes(range(256)) * 10   # 2560 bytes
        seqs = [(base, 0, 1), (b"", 400, 2500)]
        roundtrip(seqs, interpret=INTERP)

    def test_multi_chain(self):
        seqs = [(b"hello world, this is chain zero. ", 40, 17),
                (b"chain one has different content! ", 60, 33)]
        roundtrip(seqs, chain_bounds=[0, 1, 2], interpret=INTERP)

    def test_fuzz_small(self):
        rng = np.random.default_rng(42)
        seqs = []
        pos = 0
        for _ in range(120):
            ll = int(rng.integers(0, 60))
            lits = rng.integers(0, 256, ll, dtype=np.uint8).tobytes()
            pos += ll
            if pos > 4:
                off = int(rng.integers(1, min(pos, 65535) + 1))
                ml = int(rng.integers(4, 80))
            else:
                off, ml = 1, 0
                if ll == 0:
                    lits, ll = b"Z", 1
                    pos += 1
            pos += ml
            seqs.append((lits, ml, off))
        roundtrip(seqs, interpret=INTERP)


@pytest.mark.skipif(not ON_TPU, reason="needs the real TPU")
class TestDecodeVectors:
    def test_t1111k_bit_exact(self, vectors_dir):
        import pathlib
        from lz4tpu import FOR_ALL, decompress_host
        from lz4tpu.frame import parse_frames
        from lz4tpu.pipeline import build_seq_table

        p = vectors_dir / "t1111k.lz4"
        if not p.exists():
            pytest.skip("vector not present")
        data = p.read_bytes()
        buf = np.frombuffer(data, np.uint8)
        parsed = parse_frames(buf, FOR_ALL)
        table = build_seq_table(buf, parsed, FOR_ALL, data)
        lits = [
            buf[s:s + n].tobytes()
            for s, n in zip(table.lit_src, table.lit_len)
        ]
        pack = mx.pack_dense(
            table.lit_len, table.match_len, table.match_off, lits
        )
        (c, got), = mx.decode_dense(pack)
        assert got == decompress_host(data)


class TestMultiPart:
    """Chains larger than one kernel part: the history ring is carried
    between parts as a kernel input/output."""

    def test_large_chain_parts(self, monkeypatch):
        # shrink the part size so the test stays fast
        monkeypatch.setattr(mx, "PART_SUBS", 4)
        rng = np.random.default_rng(5)
        seqs = []
        # ~25 KiB of output with matches reaching across part boundaries
        base = rng.integers(0, 256, 600, dtype=np.uint8).tobytes()
        seqs.append((base, 0, 1))
        pos = 600
        for k in range(300):
            ll = int(rng.integers(0, 30))
            lits = rng.integers(0, 256, ll, dtype=np.uint8).tobytes()
            pos += ll
            off = int(rng.integers(1, min(pos, 600 + k * 100) + 1))
            ml = int(rng.integers(4, 120))
            pos += ml
            seqs.append((lits, ml, off))
        roundtrip(seqs, interpret=INTERP)
