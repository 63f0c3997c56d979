"""Span-parallel decode of monolithic chains (lz4tpu/spans.py +
dist span units): boundary-ring provenance resolution (native vs
numpy vs host decode, with length extremes per the mod-64Ki-wrap
regression class), span column clipping, golden/kernel span decode
with ring seeds, and the sharded span path end to end on the 8-way
mesh."""

import pathlib

import numpy as np
import pytest

from lz4tpu import FOR_ALL, compress, decompress_host
from lz4tpu import spans as sp
from lz4tpu.device import fused
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table, _chains_of

V = pathlib.Path("/root/reference/test_vectors_lz4")


def _chain_cols(data):
    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    table = build_seq_table(buf, parsed, FOR_ALL, data)
    chain = _chains_of(table)[0]
    sl = slice(chain.seq_lo, chain.seq_hi)
    return (buf, table, chain,
            (table.lit_len[sl], table.match_len[sl],
             table.match_off[sl], table.lit_src[sl]))


def _ring_expect(ref: bytes, B: int, n: int = sp.RING) -> np.ndarray:
    lo = max(B - n, 0)
    out = np.zeros(n, np.uint8)
    out[n - (B - lo):] = np.frombuffer(ref[lo:B], np.uint8)
    return out


# ---------------------------------------------------------------------------
# boundary-ring resolver
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name", ["t1111k", "t300k", "t100k", "z2841", "b3444k"]
)
def test_resolve_ring_matches_host_and_numpy(name):
    data = (V / f"{name}.lz4").read_bytes()
    ref = decompress_host(data)
    buf, table, chain, (ll, ml, mo, ls) = _chain_cols(data)
    starts = sp._starts_ext(ll, ml)
    n_out = chain.out_hi - chain.out_lo
    step = max(8, (n_out // 2048) // 6)
    bnds = [b * 2048 for b in range(8, n_out // 2048, step)]
    for B in bnds:
        nat = sp.resolve_ring_bytes(ll, ml, mo, ls, buf, B,
                                    sp.RING, starts)
        npy = sp._resolve_ring_bytes_numpy(ll, ml, mo, ls, buf, B,
                                           sp.RING, starts)
        assert np.array_equal(nat, _ring_expect(ref, B)), (name, B)
        assert np.array_equal(npy, nat), (name, B)


def _fuzz_payload(seed: int) -> bytes:
    """Structured payloads hitting the resolver's regimes: RLE
    pyramids (period 1..8), long periodic matches spanning > 128 KiB
    (the mod-64Ki wrap class), mutated-dictionary text, and raw
    randomness."""
    rng = np.random.default_rng(seed)
    parts = []
    kind = seed % 4
    if kind == 0:
        # > 128 KiB of short-period data: single giant overlapping
        # matches, positions wrap the 64 Ki ring more than twice
        period = int(rng.integers(1, 9))
        pat = rng.integers(0, 256, period, dtype=np.uint8)
        parts.append(np.tile(pat, (300 * 1024) // period + 1).tobytes())
        parts.append(rng.integers(0, 256, 500, dtype=np.uint8).tobytes())
    elif kind == 1:
        base = rng.integers(32, 127, 8192, dtype=np.uint8)
        for _ in range(30):
            b = base.copy()
            idx = rng.integers(0, 8192, 64)
            b[idx] = rng.integers(32, 127, 64)
            parts.append(b.tobytes())
    elif kind == 2:
        words = [rng.integers(97, 123, rng.integers(3, 9),
                              dtype=np.uint8).tobytes()
                 for _ in range(200)]
        parts.append(b" ".join(
            words[rng.integers(0, 200)] for _ in range(30000)))
    else:
        parts.append(rng.integers(0, 256, 150 * 1024,
                                  dtype=np.uint8).tobytes())
        parts.append(b"Z" * int(rng.integers(1, 70000)))
    return b"".join(parts)


@pytest.mark.parametrize("seed", range(8))
def test_resolve_ring_fuzz(seed):
    payload = _fuzz_payload(seed)
    data = compress(payload, block_max_code=5)
    buf, table, chain, (ll, ml, mo, ls) = _chain_cols(data)
    starts = sp._starts_ext(ll, ml)
    n_out = chain.out_hi - chain.out_lo
    assert n_out == len(payload)
    rng = np.random.default_rng(1000 + seed)
    bnds = sorted(set(
        int(b) * 2048
        for b in rng.integers(1, max(2, n_out // 2048), 5)
    ))
    for B in bnds:
        nat = sp.resolve_ring_bytes(ll, ml, mo, ls, buf, B,
                                    sp.RING, starts)
        assert np.array_equal(nat, _ring_expect(ref=payload, B=B)), B
        npy = sp._resolve_ring_bytes_numpy(ll, ml, mo, ls, buf, B,
                                           sp.RING, starts)
        assert np.array_equal(npy, nat), B


def test_resolve_ring_work_caps():
    """Both resolvers stop at their work budgets instead of running
    unbounded on adversarial chain depth."""
    data = (V / "t1111k.lz4").read_bytes()
    buf, table, chain, (ll, ml, mo, ls) = _chain_cols(data)
    starts = sp._starts_ext(ll, ml)
    with pytest.raises(sp.SpanResolveOverflow):
        sp.resolve_ring_bytes(ll, ml, mo, ls, buf, 512 * 1024,
                              sp.RING, starts, work_max=100)
    with pytest.raises(sp.SpanResolveOverflow):
        sp._resolve_ring_bytes_numpy(ll, ml, mo, ls, buf, 512 * 1024,
                                     sp.RING, starts, work_max=100)


# ---------------------------------------------------------------------------
# span planning + column clipping
# ---------------------------------------------------------------------------

def test_plan_spans_properties():
    for n_out, parts in [(1137664, 8), (1137664, 3), (300 << 10, 8),
                         (64 << 10, 4), (2048, 8), (0, 4),
                         (257 << 20, 16)]:
        ranges = sp.plan_spans(n_out, parts)
        n_sub = -(-n_out // sp.SUB)
        if not ranges:
            assert n_sub == 0
            continue
        assert ranges[0][0] == 0 and ranges[-1][1] == n_sub
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c
        sizes = []
        for a, b in ranges:
            assert a % sp.RING_SUBS == 0   # 64 KiB-aligned boundaries
            assert b == n_sub or b % sp.RING_SUBS == 0
            sizes.append(b - a)
        if len(ranges) > 1:
            assert min(sizes) >= 2 * sp.RING_SUBS - sp.RING_SUBS + 1 or \
                min(sizes) >= 1
            # balanced: unit counts differ by at most one 64 KiB unit
            units = [-(-s // sp.RING_SUBS) for s in sizes[:-1]]
            if units:
                assert max(units) - min(units) <= 1
        assert len(ranges) <= max(1, parts)


def test_split_chain_spans_cover_exactly():
    data = (V / "t1111k.lz4").read_bytes()
    buf, table, chain, (ll, ml, mo, ls) = _chain_cols(data)
    n_out = chain.out_hi - chain.out_lo
    ranges = sp.plan_spans(n_out, 8)
    spans_ = sp.split_chain_spans(ll, ml, mo, ls, ranges)
    assert [(s.out_lo, s.out_hi) for s in spans_] == [
        (a * sp.SUB, min(b * sp.SUB, n_out)) for a, b in ranges
    ]
    for s in spans_:
        assert int(s.ll.sum() + s.ml.sum()) == s.out_hi - s.out_lo


# ---------------------------------------------------------------------------
# span decode: golden (numpy kernel model) and Pallas kernel
# ---------------------------------------------------------------------------

def _span_decode_golden(data, n_parts, min_subs=2 * sp.RING_SUBS):
    buf, table, chain, (ll, ml, mo, ls) = _chain_cols(data)
    n_out = chain.out_hi - chain.out_lo
    ranges = sp.plan_spans(n_out, n_parts, min_subs=min_subs)
    assert len(ranges) > 1
    spans_ = sp.split_chain_spans(ll, ml, mo, ls, ranges)
    starts = sp._starts_ext(ll, ml)
    out = bytearray()
    for s in spans_:
        prep = sp.prep_span(s, buf, pooled=False)
        seed = None
        if s.out_lo:
            ring = sp.resolve_ring_bytes(ll, ml, mo, ls, buf,
                                         s.out_lo, sp.RING, starts)
            seed = np.zeros(sp.RING, np.uint8)
            q0 = s.out_lo - sp.RING
            seed[(q0 + np.arange(sp.RING)) % sp.RING] = ring
        rows = fused.golden_decode(prep, ring_init=seed)
        out += rows[: s.out_hi - s.out_lo].tobytes()
    return bytes(out)


def test_golden_span_decode_t1111k():
    """The BASELINE-named monolithic chain, split 8 ways and decoded
    span by span with host-resolved ring seeds — bit-exact against
    the reference bytes."""
    data = (V / "t1111k.lz4").read_bytes()
    assert _span_decode_golden(data, 8) == decompress_host(data)


def test_golden_span_decode_t300k():
    data = (V / "t300k.lz4").read_bytes()
    assert (_span_decode_golden(data, 4, min_subs=sp.RING_SUBS)
            == decompress_host(data))


@pytest.mark.parametrize("name,parts", [("t100k", 2), ("t300k", 4)])
def test_kernel_span_decode(name, parts):
    """The actual Pallas kernel (interpreter on CPU CI) decoding
    host-seeded spans bit-exactly."""
    import jax

    data = (V / f"{name}.lz4").read_bytes()
    ref = decompress_host(data)
    buf, table, chain, (ll, ml, mo, ls) = _chain_cols(data)
    starts = sp._starts_ext(ll, ml)
    n_out = chain.out_hi - chain.out_lo
    ranges = sp.plan_spans(n_out, parts, min_subs=16)
    assert len(ranges) > 1
    spans_ = sp.split_chain_spans(ll, ml, mo, ls, ranges)
    out = bytearray()
    for s in spans_:
        prep = sp.prep_span(s, buf, pooled=False)
        ring = (None if s.out_lo == 0 else
                sp.resolve_ring_bytes(ll, ml, mo, ls, buf, s.out_lo,
                                      sp.RING, starts))
        rows = np.asarray(jax.device_get(sp.decode_span_on_device(
            prep, ring, s.out_lo, interpret=True)))
        out += rows[: s.out_hi - s.out_lo].tobytes()
    assert bytes(out) == ref


def test_slice_prep_matches_span_prep():
    """The production dist path (chain-coordinate slices of ONE whole-
    chain prep) and the span-local per-span preps decode identically:
    golden decode of every sliced span with a chain-layout ring seed
    equals the reference bytes."""
    data = (V / "t300k.lz4").read_bytes()
    ref = decompress_host(data)
    buf, table, chain, (ll, ml, mo, ls) = _chain_cols(data)
    starts = sp._starts_ext(ll, ml)
    n_out = chain.out_hi - chain.out_lo
    prep = fused.prep_fused(ll, ml, mo, ls, buf, pooled=False)
    ranges = sp.plan_spans(n_out, 4, min_subs=sp.RING_SUBS)
    assert len(ranges) > 1
    out = bytearray()
    for (a, b) in ranges:
        B = a * sp.SUB
        out_len = min(b * sp.SUB, n_out) - B
        pslice = sp.slice_prep(prep, a, b, out_len)
        seed = None
        if B:
            ring = sp.resolve_ring_bytes(ll, ml, mo, ls, buf, B,
                                         sp.RING, starts)
            seed = np.zeros(sp.RING, np.uint8)
            q0 = B - sp.RING
            # chain-global layout: byte q at q mod 64 Ki (boundaries
            # are 64 KiB multiples, so this equals the span-local roll)
            seed[(q0 + np.arange(sp.RING)) % sp.RING] = ring
        rows = fused.golden_decode(pslice, ring_init=seed)
        out += rows[:out_len].tobytes()
    assert bytes(out) == ref


# ---------------------------------------------------------------------------
# sharded span units on the 8-way mesh
# ---------------------------------------------------------------------------

def _mono_fused_frame(seed=11, size=220 * 1024):
    rng = np.random.default_rng(seed)
    base = rng.integers(32, 127, 8192, dtype=np.uint8)
    chunks = []
    for _ in range(size // 8192 + 2):
        b = base.copy()
        idx = rng.integers(0, 8192, 60)
        b[idx] = rng.integers(32, 127, 60)
        chunks.append(b.tobytes())
    payload = b"".join(chunks)[:size]
    return payload, compress(payload, block_max_code=4)


def _table_of(frame):
    buf = np.frombuffer(frame, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    return buf, build_seq_table(buf, parsed, FOR_ALL, frame)


def test_sharded_span_decode_monolithic():
    import jax

    from lz4tpu import dist

    payload, frame = _mono_fused_frame()
    buf, table = _table_of(frame)
    assert len(_chains_of(table)) == 1
    mesh = dist.make_mesh()
    units, split = dist._work_units(table, buf, mesh.devices.size,
                                    min_subs=8)
    assert split and len(units) > 1
    # units partition the output
    pos = 0
    for u in units:
        assert u.out_lo == pos
        pos = u.out_hi
    assert pos == table.n_out
    out = dist.decode_sharded_chains(table, buf, mesh, interpret=True,
                                     span_min_subs=8)
    assert out.tobytes() == payload
    # HBM-resident variant: spans stay on their devices, bit-exact
    segs = dist.decode_sharded_chains_to_device(
        table, buf, mesh, interpret=True, span_min_subs=8)
    got = np.zeros(table.n_out, np.uint8)
    devs = set()
    for lo, arr in segs:
        got[lo:lo + arr.shape[0]] = np.asarray(jax.device_get(arr))
        devs |= {d.id for d in arr.devices()}
    assert got.tobytes() == payload
    assert len(devs) > 1, "span units did not spread across devices"


def test_work_units_fallbacks():
    from lz4tpu import dist

    # sparse-class monolithic chain (zeros): NOT split
    z = compress(b"\x00" * (300 << 10), block_max_code=4)
    buf, table = _table_of(z)
    units, split = dist._work_units(table, buf, 8, min_subs=8)
    assert not split and len(units) == len(_chains_of(table))

    # patch-budget-overflow chain (dense short-offset text): NOT split
    rng = np.random.default_rng(7)
    words = [rng.integers(97, 123, rng.integers(3, 9),
                          dtype=np.uint8).tobytes() for _ in range(300)]
    payload = b" ".join(
        words[rng.integers(0, 300)] for _ in range(40000))[:200 * 1024]
    f = compress(payload, block_max_code=4)
    buf, table = _table_of(f)
    units, split = dist._work_units(table, buf, 8, min_subs=8)
    assert not split

    # as many chains as devices: nothing to split
    payload, frame = _mono_fused_frame(seed=5, size=64 * 1024)
    many = frame * 8
    buf, table = _table_of(many)
    units, split = dist._work_units(table, buf, 8, min_subs=8)
    assert not split and len(units) == len(_chains_of(table))


def test_span_split_possible_screen():
    from lz4tpu import dist

    payload, frame = _mono_fused_frame()
    buf, table = _table_of(frame)
    assert dist._span_split_possible(table, 8, min_subs=8)
    assert not dist._span_split_possible(table, 1, min_subs=8)
    z = compress(b"\x00" * (300 << 10))
    bufz, tablez = _table_of(z)
    assert not dist._span_split_possible(tablez, 8, min_subs=8)


# ---------------------------------------------------------------------------
# split_fused_chain (top-level helper) + threaded ring resolution
# ---------------------------------------------------------------------------

def test_split_fused_chain_end_to_end():
    """The one-call helper (spans + span-local preps + boundary rings)
    decodes bit-exact through the golden model on a monolithic chain."""
    data = (V / "t300k.lz4").read_bytes()
    buf, table, chain, _cols = _chain_cols(data)
    res = sp.split_fused_chain(table, chain, buf, 4)
    assert res is not None
    spans_, preps, rings = res
    assert len(spans_) == len(preps) == len(rings) > 1
    assert rings[0] is None and all(r is not None for r in rings[1:])
    out = bytearray()
    for s, prep, ring in zip(spans_, preps, rings):
        seed = None
        if ring is not None:
            seed = np.zeros(sp.RING, np.uint8)
            q0 = s.out_lo - sp.RING
            seed[(q0 + np.arange(sp.RING)) % sp.RING] = ring
        rows = fused.golden_decode(prep, ring_init=seed)
        out += rows[: s.out_hi - s.out_lo].tobytes()
    assert bytes(out) == decompress_host(data)


def test_split_fused_chain_device_ring_chaining():
    """with_rings=False (device ring-chaining mode) returns no rings
    and the same span/prep partition."""
    data = (V / "t300k.lz4").read_bytes()
    buf, table, chain, _cols = _chain_cols(data)
    res = sp.split_fused_chain(table, chain, buf, 4, with_rings=False)
    assert res is not None
    spans_, preps, rings = res
    assert rings is None and len(spans_) == len(preps) > 1
    assert sum(s.out_hi - s.out_lo for s in spans_) == (
        chain.out_hi - chain.out_lo)


def test_split_fused_chain_too_small_returns_none():
    """A chain below the minimum span size must not split."""
    data = (V / "t2.lz4").read_bytes()
    buf, table, chain, _cols = _chain_cols(data)
    assert sp.split_fused_chain(table, chain, buf, 4) is None


def test_resolve_rings_threaded_matches_serial(monkeypatch):
    """The thread-pooled multi-boundary resolver is bit-identical to
    per-boundary serial calls (the GIL-released native walk writes
    disjoint outputs)."""
    data = (V / "t300k.lz4").read_bytes()
    buf, _table, _chain, (ll, ml, mo, ls) = _chain_cols(data)
    starts = sp._starts_ext(ll, ml)
    boundaries = [sp.RING, 2 * sp.RING, 3 * sp.RING]
    serial = [sp.resolve_ring_bytes(ll, ml, mo, ls, buf, b, sp.RING,
                                    starts)
              for b in boundaries]
    monkeypatch.setenv("LZ4TPU_PACK_THREADS", "3")
    threaded = sp.resolve_rings(ll, ml, mo, ls, buf, boundaries, starts)
    assert len(threaded) == 3
    for a, b in zip(serial, threaded):
        assert np.array_equal(a, b)


def test_resolver_zero_boundary_returns_zero_window():
    # boundary 0: the window lies entirely before the chain start —
    # all-zero by contract (never referenced by a valid span).
    import numpy as np

    from lz4tpu import spans

    ll = np.array([4], np.int32)
    ml = np.array([0], np.int32)
    mo = np.array([1], np.int32)
    ls = np.array([0], np.int32)
    buf = np.frombuffer(b"ABCD", np.uint8)
    out = spans._resolve_ring_bytes_numpy(ll, ml, mo, ls, buf, 0, 16)
    assert out.shape == (16,) and not out.any()
