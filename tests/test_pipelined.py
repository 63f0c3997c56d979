"""Pipelined single-chain decode (device/fused.decode_fused_pipelined
+ native lz4tpu_prep_fused_pre_range): the host preps chunk k+1 while
the device decodes chunk k, rings chained on device.

The range prep is pinned DIFFERENTIALLY against the whole-chain prep
(bit-identical per-substep content; only chunk-start reload flags may
be forced on), and the decode bit-exactly against the host engine —
phase-counter-style proofs per the one-core box's measurement rules
(wall-time overlap is not measurable here; the tunnel's dispatch
floor also keeps this path opt-in, see pipeline._pipelined_rows)."""

import pathlib

import numpy as np
import pytest

from lz4tpu import FOR_ALL, compress, decompress_host, native
from lz4tpu.device import fused as fu
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table, decompress_to_device

V = pathlib.Path("/root/reference/test_vectors_lz4")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)


def _mono_payload(size=400 * 1024, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(32, 127, 8192, dtype=np.uint8)
    chunks = []
    for _ in range(size // 8192 + 2):
        b = base.copy()
        idx = rng.integers(0, 8192, 60)
        b[idx] = rng.integers(32, 127, 60)
        chunks.append(b.tobytes())
    return b"".join(chunks)[:size]


def _pre_table(data):
    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    t = build_seq_table(buf, parsed, FOR_ALL, data, pooled_cols=True)
    assert t.pre is not None
    return buf, t


@pytest.mark.parametrize("name,pipe", [("t100k", 16), ("t1111k", 64)])
def test_range_prep_differential(name, pipe):
    """Range preps over consecutive chunks reproduce the whole-chain
    prep arrays bit-identically (except forced chunk-start reload
    flags) — the native range entry cannot drift from the serial
    pass."""
    data = (V / f"{name}.lz4").read_bytes()
    buf, t = _pre_table(data)
    whole = fu.prep_fused(t.lit_len, t.match_len, t.match_off,
                          t.lit_src, buf, pooled=False)
    starts_ext, litpos_ext, lits_flat, _max_off = t.pre
    n_sub = whole.n_sub
    nst = max(n_sub, 1)
    winq = np.zeros(nst, np.int32)
    scal = np.zeros((nst, 8), np.int32)
    seqrec = np.zeros((nst, 2, 8, fu.SEQ_MAX // 8), np.int32)
    patch = np.zeros((nst, 8, fu.PATCH_MAX // 8), np.int32)
    cols = [np.ascontiguousarray(a, np.int32) for a in
            (t.lit_len, t.match_len, t.match_off, t.lit_src)]
    n_out = int(starts_ext[t.lit_len.size])
    tot_rec = tot_pat = 0
    max_rec = max_pat = 0
    for i_lo in range(0, n_sub, pipe):
        i_hi = min(i_lo + pipe, n_sub)
        nr, np_, mr, mp = native.prep_fused_pre_range(
            *cols, buf, whole.lits.shape[0],
            starts_ext, litpos_ext, lits_flat, n_out,
            i_lo, i_hi, winq, scal, seqrec, patch, None,
        )
        tot_rec += nr
        tot_pat += np_
        max_rec = max(max_rec, mr)
        max_pat = max(max_pat, mp)
    assert np.array_equal(seqrec, whole.seqrec[:nst])
    assert np.array_equal(patch, whole.patch[:nst])
    assert np.array_equal(winq, whole.winq[:nst])
    rows, cols_d = np.where(scal != whole.scal[:nst])
    assert set(cols_d.tolist()) <= {6}
    assert all(r % pipe == 0 and scal[r, 6] == 1 for r in rows)
    assert (tot_rec, tot_pat) == (whole.n_seq_recs, whole.n_patches)
    assert (max_rec, max_pat) == (whole.max_recs, whole.max_patches)


def test_pipelined_decode_bit_exact():
    import jax

    payload = _mono_payload()
    data = compress(payload, block_max_code=7)
    buf, t = _pre_table(data)
    ctr = {}
    flat, n = fu.decode_fused_pipelined(
        t.lit_len, t.match_len, t.match_off, t.lit_src, buf, t.pre,
        interpret=True, pipe_subs=64, counters=ctr,
    )
    assert np.asarray(jax.device_get(flat))[:n].tobytes() == payload
    # phase counters: the chain was genuinely cut into chunks, each
    # prepped then dispatched, preps strictly interleaving dispatches
    chunks = ctr["chunks"]
    assert len(chunks) == 4 and chunks[0] == (0, 64)
    assert chunks[-1][1] * fu.SUB >= len(payload)
    for k in range(len(chunks)):
        assert ctr["prep_done_t"][k] <= ctr["dispatch_t"][k]
        if k:
            # chunk k's prep started only after chunk k-1 dispatched —
            # i.e. while the device (asynchronously) held chunk k-1
            assert ctr["dispatch_t"][k - 1] <= ctr["prep_done_t"][k]


def test_pipelined_tail_padding():
    """A tail chunk shorter than pipe_subs decodes padded zero
    substeps whose rows are sliced off."""
    import jax

    payload = _mono_payload(size=150 * 1024)   # 75 substeps
    data = compress(payload, block_max_code=7)
    buf, t = _pre_table(data)
    flat, n = fu.decode_fused_pipelined(
        t.lit_len, t.match_len, t.match_off, t.lit_src, buf, t.pre,
        interpret=True, pipe_subs=64,
    )
    assert n == len(payload)
    assert int(flat.shape[0]) == 2 * 64 * fu.SUB   # padded launches
    assert np.asarray(jax.device_get(flat))[:n].tobytes() == payload


def test_pipelined_api_opt_in():
    import jax

    payload = _mono_payload(size=200 * 1024)
    data = compress(payload, block_max_code=7)
    res = decompress_to_device(data, interpret=True, pipelined=True)
    assert np.asarray(jax.device_get(res)).tobytes() == payload
    # default stays the monolithic launch (opt-in flag off)
    res2 = decompress_to_device(data, interpret=True)
    assert np.asarray(jax.device_get(res2)).tobytes() == payload


def test_pipelined_multi_block_via_phase1():
    """Multi-block single-chain streams lack the scan fast-path tuple;
    the native phase-1 pass reconstructs it (differential against
    scan_block_full on a single-block vector) and the pipelined path
    decodes bit-exactly."""
    import jax

    # phase-1 differential vs the scan's own tuple
    d1 = (V / "t1111k.lz4").read_bytes()
    b1 = np.frombuffer(d1, np.uint8)
    t1 = build_seq_table(b1, parse_frames(b1, FOR_ALL), FOR_ALL, d1,
                         pooled_cols=True)
    s_e, l_e, lits_e, mo_e = t1.pre
    s_g, l_g, lits_g, mo_g = native.prep_phase1(
        t1.lit_len, t1.match_len, t1.match_off, t1.lit_src, b1)
    assert np.array_equal(s_g, s_e[:s_g.size])
    assert np.array_equal(l_g, l_e[:l_g.size])
    assert np.array_equal(lits_g, lits_e[:lits_g.size])
    assert mo_g == mo_e

    data = (V / "t300k.lz4").read_bytes()    # 5 blocks -> pre is None
    buf = np.frombuffer(data, np.uint8)
    t = build_seq_table(buf, parse_frames(buf, FOR_ALL), FOR_ALL,
                        data, pooled_cols=True)
    assert t.pre is None
    res = decompress_to_device(data, interpret=True, pipelined=True)
    assert (np.asarray(jax.device_get(res)).tobytes()
            == decompress_host(data))


def test_pipelined_skips_sparse_chains():
    z = compress(b"\x00" * 100000, block_max_code=7)
    bufz = np.frombuffer(z, np.uint8)
    pz = parse_frames(bufz, FOR_ALL)
    tz = build_seq_table(bufz, pz, FOR_ALL, z, pooled_cols=True)
    from lz4tpu.pipeline import _pipelined_rows

    assert _pipelined_rows(bufz, tz, True, True) is None   # sparse
