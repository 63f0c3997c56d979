"""Round-5 branch-coverage tests (round-4 verdict next-#5/#7): the
knob-selection, fallback, and overflow branches of the fused engine,
the span planner/resolver, and the dense-2 device-resident launcher
that the behavioral suites leave one-sided.

Every test asserts BEHAVIOR (which variant runs / what it produces),
not mere execution: fallbacks are pinned differentially against the
engine they replace, overflows against the exact budget they guard.
"""

import pathlib

import numpy as np
import pytest

from lz4tpu import FOR_ALL, compress, decompress_host, native
from lz4tpu import spans as sp
from lz4tpu.device import fused, mxu2
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import _chains_of, build_seq_table

V = pathlib.Path("/root/reference/test_vectors_lz4")


def _table(data, pooled_cols=False):
    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    t = build_seq_table(buf, parsed, FOR_ALL, data,
                        pooled_cols=pooled_cols)
    return buf, t


def _seq_ref(ll, ml, mo, ring_init):
    """Sequential model of chain decode over a ring-seeded history:
    position p < 0 reads ring_init[p mod 64Ki] (the kernel's ring
    wrap), p >= 0 reads produced output."""
    out = []
    for l_, m_, o_ in zip(ll, ml, mo):
        assert l_ == 0, "literal-free chains only"
        for _ in range(int(m_)):
            p = len(out) - int(o_)
            out.append(out[p] if p >= 0 else int(ring_init[p % 65536]))
    return np.array(out, np.uint8)


# ---------------------------------------------------------------------------
# fused prep: helpers and edge inputs
# ---------------------------------------------------------------------------

def test_resolve_patches_no_positions():
    """Zero patch positions: the resolver loop must not enter."""
    pst = np.array([0, fused.SENTINEL], np.int64)
    pll = np.array([4, 0], np.int64)
    pmo = np.array([1, 1], np.int64)
    pli = np.array([0, 4], np.int64)
    out = fused._resolve_patches(pst, pll, pmo, pli,
                                 np.zeros(0, np.int64),
                                 np.zeros(0, np.int64))
    assert out.size == 0


def test_max_patches_histogram_edges():
    """Default chain_ranges, a zero-output range (skipped), and a
    chain with no in-substep matches (empty propagation front)."""
    ll = np.array([100], np.int32)
    ml = np.array([0], np.int32)
    mo = np.array([1], np.int32)
    assert fused.max_patches_per_substep(ll, ml, mo) == 0
    assert fused.max_patches_per_substep(
        ll, ml, mo, chain_ranges=[(0, 0), (0, 1)]
    ) == 0


def test_numpy_prep_fallback_matches_host(monkeypatch):
    """With the native engine gated off, prep_fused must route to the
    pure-numpy prep and stay bit-exact (golden model vs host engine).
    This is the correctness contract of the fallback the glue
    advertises (native/__init__ available())."""
    data = (V / "t389.lz4").read_bytes()
    buf, t = _table(data)
    ref = decompress_host(data)
    monkeypatch.setattr(native, "available", lambda: False)
    prep = fused.prep_fused(
        t.lit_len, t.match_len, t.match_off, t.lit_src, buf
    )
    out = fused.golden_decode(prep)
    (_c, slo, _shi, n_out) = prep.out_spans[0]
    assert bytes(out[slo * fused.SUB: slo * fused.SUB + n_out]) == ref


def test_numpy_prep_zero_width_chain():
    """A zero-sequence chain range yields an empty prep (no records,
    no patches, no literal stream) and golden-decodes to nothing."""
    e = np.zeros(0, np.int32)
    prep = fused._prep_fused_numpy(
        e, e, e, e, np.zeros(0, np.uint8), chain_ranges=[(0, 0)]
    )
    assert prep.n_sub == 0
    assert prep.n_seq_recs == 0 and prep.n_patches == 0
    assert prep.out_spans == [(0, 0, 0, 0)]
    assert fused.golden_decode(prep).size == 0


def test_numpy_prep_literal_free_ring_chain():
    """A chain with NO literal bytes (every source is ring history or
    in-substep self-reference — the span-seeded shape): numpy prep +
    golden with a ring seed must match a sequential model."""
    ll = np.array([0, 0], np.int32)
    ml = np.array([24, 40], np.int32)
    mo = np.array([8, 16], np.int32)
    ls = np.zeros(2, np.int32)
    prep = fused._prep_fused_numpy(ll, ml, mo, ls,
                                   np.zeros(0, np.uint8))
    assert prep.n_sub == 1 and prep.n_patches > 0
    ring = ((np.arange(65536) * 37 + 11) % 251).astype(np.uint8)
    want = _seq_ref(ll, ml, mo, ring)
    got = fused.golden_decode(prep, ring_init=ring)[:want.size]
    assert (got == want).all()


def test_numpy_prep_match_span_budget():
    """A single match crossing more than 64 substeps must raise
    FusedOverflow (the numpy analog of the native span cap) — such
    chains belong to the sparse RLE engine, not the fused kernel."""
    ll = np.array([8], np.int32)
    ml = np.array([150000], np.int32)
    mo = np.array([1], np.int32)
    ls = np.array([0], np.int32)
    buf = np.arange(8, dtype=np.uint8)
    with pytest.raises(fused.FusedOverflow, match="64 substeps"):
        fused._prep_fused_numpy(ll, ml, mo, ls, buf)


def test_pool_skips_oversized_preps():
    """Preps beyond the request size class (nst > 2048) must bypass the
    rotating pool: exact-size, zeroed, caller-owned arrays."""
    a1 = fused._pool_arrays(4096, 64)
    a2 = fused._pool_arrays(4096, 64)
    assert a1[1].shape == (4096,) and a1[0].shape == (64,)
    assert all((x == 0).all() for x in a1)
    assert a1[1] is not a2[1]


# ---------------------------------------------------------------------------
# fused prep: native-path routing and overflow mapping
# ---------------------------------------------------------------------------

needs_native = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)


@needs_native
def test_pre_with_explicit_ranges_routes_general_native():
    """``pre`` is a single-whole-chain fast path: explicit chain_ranges
    that are NOT the full table must route to the general native prep
    (and a zero-width range among them prep to nothing)."""
    data = (V / "t100k.lz4").read_bytes()
    buf, t = _table(data, pooled_cols=True)
    assert t.pre is not None
    ref = decompress_host(data)
    S = t.lit_len.size
    prep = fused.prep_fused(
        t.lit_len, t.match_len, t.match_off, t.lit_src, buf,
        chain_ranges=[(0, 0), (0, S)], pre=t.pre,
    )
    spans_ = prep.out_spans
    assert spans_[0] == (0, 0, 0, 0)          # the empty range
    (_c, slo, _shi, n_out) = spans_[1]
    out = fused.golden_decode(prep)
    assert bytes(out[slo * fused.SUB: slo * fused.SUB + n_out]) == ref


@needs_native
def test_pre_path_overflow_maps_to_fusedoverflow():
    """A budget overflow inside the native PRE prep (offset-2 run:
    ~2046 in-substep bytes per substep >> PATCH_MAX) must surface as
    FusedOverflow, same as the general path."""
    data = compress(b"ab" * 4000)
    buf, t = _table(data, pooled_cols=True)
    assert t.pre is not None
    with pytest.raises(fused.FusedOverflow):
        fused.prep_fused(
            t.lit_len, t.match_len, t.match_off, t.lit_src, buf,
            pre=t.pre,
        )


@needs_native
def test_threaded_prep_overflow_maps(monkeypatch):
    """An overflow raised inside the THREADED multi-chain prep pool
    must map to FusedOverflow exactly like the serial path."""
    data = (V / "t389.lz4").read_bytes()
    buf, t = _table(data)
    S = t.lit_len.size
    ll = np.concatenate([t.lit_len, [8]]).astype(np.int32)
    ml = np.concatenate([t.match_len, [5000]]).astype(np.int32)
    mo = np.concatenate([t.match_off, [1]]).astype(np.int32)
    ls = np.concatenate([t.lit_src, [0]]).astype(np.int32)
    monkeypatch.setattr(native, "pack_threads", lambda: 2)
    with pytest.raises(fused.FusedOverflow):
        fused.prep_fused(ll, ml, mo, ls, buf,
                         chain_ranges=[(0, S), (S, S + 1)])


# ---------------------------------------------------------------------------
# pipelined decode edges
# ---------------------------------------------------------------------------

@needs_native
def test_pipelined_single_exact_chunk():
    """pipe_subs == n_sub: one launch, no tail padding, no concat."""
    data = (V / "t100k.lz4").read_bytes()
    ref = decompress_host(data)
    buf, t = _table(data, pooled_cols=True)
    n_sub = -(-len(ref) // fused.SUB)
    rows, n_out = fused.decode_fused_pipelined(
        t.lit_len, t.match_len, t.match_off, t.lit_src, buf, t.pre,
        interpret=True, pipe_subs=n_sub,
    )
    assert n_out == len(ref)
    assert np.asarray(rows)[:n_out].tobytes() == ref


@needs_native
def test_pipelined_record_budget():
    """More producing sequences in one substep than SEQ_MAX must be
    rejected up front (before any launch)."""
    S = 3000
    ll = np.ones(S, np.int32)
    ml = np.zeros(S, np.int32)
    mo = np.ones(S, np.int32)
    ls = np.arange(S, dtype=np.int32)
    buf = (np.arange(S) % 251).astype(np.uint8)
    pre = (np.arange(S + 1, dtype=np.int32),
           np.arange(S + 1, dtype=np.int32), buf.copy(), 1)
    with pytest.raises(fused.FusedOverflow, match="seq records"):
        fused.decode_fused_pipelined(ll, ml, mo, ls, buf, pre)


@needs_native
def test_pipelined_range_prep_overflow():
    """A patch-budget overflow inside the native RANGE prep must map
    to FusedOverflow (offset-1 run in the first chunk)."""
    ll = np.array([8], np.int32)
    ml = np.array([5000], np.int32)
    mo = np.array([1], np.int32)
    ls = np.array([0], np.int32)
    buf = np.arange(8, dtype=np.uint8)
    pre = (np.array([0, 5008], np.int32), np.array([0, 8], np.int32),
           buf.copy(), 1)
    with pytest.raises(fused.FusedOverflow):
        fused.decode_fused_pipelined(ll, ml, mo, ls, buf, pre)


# ---------------------------------------------------------------------------
# split decode: ring seed + aligned substep count
# ---------------------------------------------------------------------------

def test_split_device_ring_seed_aligned():
    """The split decode with an explicit ring seed and n_sub % 8 == 0
    (no scalar padding) matches the host bytes."""
    import jax
    import jax.numpy as jnp

    payload = (V / "t100k.bin").read_bytes()[: 8 * fused.SUB]
    data = compress(payload)
    buf, t = _table(data)
    prep = fused.prep_fused(
        t.lit_len, t.match_len, t.match_off, t.lit_src, buf
    )
    assert prep.n_sub == 8
    args = tuple(jnp.asarray(x) for x in (
        prep.seqrec, prep.lits, prep.winq, prep.scal, prep.patch))
    ring0 = jnp.zeros((fused.RPAGES, fused.ROWB), jnp.bfloat16)
    rows, _ring = fused._decode_split_device(
        *args, ring0, n_sub=prep.n_sub, interpret=True)
    flat = np.asarray(jax.device_get(rows)).reshape(-1)
    assert bytes(flat[: len(payload)]) == payload


# ---------------------------------------------------------------------------
# span planner / boundary resolver
# ---------------------------------------------------------------------------

def test_plan_spans_edges():
    assert sp.plan_spans(0, 4) == []
    n_sub = -(-5000 // fused.SUB)
    assert sp.plan_spans(5000, 1) == [(0, n_sub)]
    # fewer 64 KiB units than 2 per part: refuse to split
    assert sp.plan_spans(100_000, 8) == [(0, -(-100_000 // fused.SUB))]


def _chain_cols(data):
    buf, table = _table(data)
    chain = _chains_of(table)[0]
    sl = slice(chain.seq_lo, chain.seq_hi)
    return buf, (table.lit_len[sl], table.match_len[sl],
                 table.match_off[sl], table.lit_src[sl])


def _ring_expect(ref, B, n=sp.RING):
    lo = max(B - n, 0)
    out = np.zeros(n, np.uint8)
    out[n - (B - lo):] = np.frombuffer(ref[lo:B], np.uint8)
    return out


def test_resolve_ring_default_starts_and_numpy_fallback(monkeypatch):
    """resolve_ring_bytes computes starts itself when not given, and
    with the native engine gated off the numpy walk produces the same
    window; boundary 0 resolves to all-zeros (nothing before the
    chain start)."""
    data = (V / "t100k.lz4").read_bytes()
    ref = decompress_host(data)
    buf, (ll, ml, mo, ls) = _chain_cols(data)
    B = 65536
    want = _ring_expect(ref, B)
    assert (sp.resolve_ring_bytes(ll, ml, mo, ls, buf, B) == want).all()
    monkeypatch.setattr(native, "available", lambda: False)
    assert (sp.resolve_ring_bytes(ll, ml, mo, ls, buf, B) == want).all()
    assert (sp.resolve_ring_bytes(ll, ml, mo, ls, buf, 0) == 0).all()


def test_resolve_work_budget_both_engines(monkeypatch):
    """An exhausted work budget raises SpanResolveOverflow from BOTH
    the native walk and the numpy fallback.  The native budget counts
    deep-walk hops (sources preceding the window), so the boundary
    must sit deep enough in a text chain that provenance reaches back
    past the window (t1111k: ~350K hops per boundary, CLAUDE.md)."""
    data = (V / "t1111k.lz4").read_bytes()
    buf, (ll, ml, mo, ls) = _chain_cols(data)
    B = 10 * 65536
    if native.available():
        with pytest.raises(sp.SpanResolveOverflow):
            sp.resolve_ring_bytes(ll, ml, mo, ls, buf, B, work_max=4)
    monkeypatch.setattr(native, "available", lambda: False)
    with pytest.raises(sp.SpanResolveOverflow):
        sp.resolve_ring_bytes(ll, ml, mo, ls, buf, B, work_max=4)


@needs_native
def test_resolve_rings_threaded(monkeypatch):
    """Multiple boundaries resolve across the thread pool (the native
    walk releases the GIL) bit-identically to one-at-a-time calls."""
    data = (V / "t100k.lz4").read_bytes()
    ref = decompress_host(data)
    buf, (ll, ml, mo, ls) = _chain_cols(data)
    monkeypatch.setattr(native, "pack_threads", lambda: 2)
    bnds = [65536, 81920]
    outs = sp.resolve_rings(ll, ml, mo, ls, buf, bnds)
    for b, o in zip(bnds, outs):
        assert (o == _ring_expect(ref, b)).all()


# ---------------------------------------------------------------------------
# dense-2 device-resident launcher
# ---------------------------------------------------------------------------

def test_dense2_rows_on_device_and_part_split():
    """decode_dense2_rows_on_device (HBM-resident rows): empty pack
    short-circuit, single-launch, and part-split with ring carry all
    match the host bytes."""
    import jax
    import jax.numpy as jnp

    e = np.zeros(0, np.int32)
    empty = mxu2.pack_dense2(e, e, e, e, np.zeros(0, np.uint8))
    assert np.asarray(
        mxu2.decode_dense2_rows_on_device(empty, interpret=True)
    ).size == 0

    data = (V / "t100k.lz4").read_bytes()
    ref = decompress_host(data)
    buf, t = _table(data)
    pack = mxu2.pack_dense2(
        t.lit_len, t.match_len, t.match_off, t.lit_src, buf
    )
    whole = np.asarray(jax.device_get(
        mxu2.decode_dense2_rows_on_device(pack, interpret=True)
    ))
    assert bytes(whole[: len(ref)]) == ref
    split = np.asarray(jax.device_get(
        mxu2.decode_dense2_rows_on_device(pack, interpret=True,
                                          part_subs=16)
    ))
    assert bytes(split[: len(ref)]) == ref
