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


def test_sparse_fill_plan_selectivity():
    """Block-fill plan only claims fill-dominated programs: tiny chains
    with no fully-covered 512 KiB block stay on the concat path, and a
    zeros-like program is claimed with no patches beyond boundaries."""
    from lz4tpu.device import sparse_decode as sp

    tiny = (sp.SparseOp("copy", 0, 4096, src=7),)
    assert sp._plan_block_fill(tiny, 4096) is None
    big = (
        sp.SparseOp("fill", 0, 9_000_000, pattern=b"\x00"),
        sp.SparseOp("copy", 9_000_000, 100, src=7),
    )
    plan = sp._plan_block_fill(big, 9_000_100)
    assert plan is not None
    vals, patches = plan
    assert vals.shape[0] == -(-9_000_100 // sp._FILL_BLK)
    # patches: the copy + the fill's partial tail block, both bounded
    assert sum(n for *_x, n in patches) <= sp._FILL_BLK


def test_resolver_continue_doubling_deep_chain():
    """A provenance chain deeper than 2**UNROLL_ITERS forces the
    resolver's continue_doubling re-entry (the convergence net: the
    flag is checked, not assumed)."""
    import jax.numpy as jnp

    from lz4tpu.device import decode as dr

    S = 70_000                      # > 2**16 = one extra round needed
    comp = jnp.asarray(np.frombuffer(b"Q\x00\x00\x00", np.uint8))
    out_start = np.arange(S, dtype=np.int32)
    lit_len = np.zeros(S, np.int32)
    lit_len[0] = 1                  # byte 0 is the only literal
    lit_src = np.zeros(S, np.int32)
    match_off = np.ones(S, np.int32)
    produces = np.ones(S, bool)
    out = dr.resolve_sources(
        comp, jnp.asarray(out_start), jnp.asarray(lit_len),
        jnp.asarray(lit_src), jnp.asarray(match_off),
        jnp.asarray(produces), S, S,
    )
    assert bytes(out) == b"Q" * S


def test_sparse_block_fill_executes():
    """The block-fill Pallas kernel + patch splice (z9m's production
    path) execute end-to-end on the CPU mesh, not just at plan time:
    a zeros-dominated frame runs `_block_fill`, and a two-byte-period
    frame exercises the non-uniform pattern-tiling patch branch."""
    zeros = bytes(2_000_000) + b"tail!" * 10
    frame = compress(zeros, block_max_code=7)
    assert decompress_device(frame) == zeros

    ab = b"ab" * 700_000
    frame2 = compress(ab, block_max_code=7)
    assert decompress_device(frame2) == ab

    # two uniform fills sharing one 512 KiB block: the larger share
    # owns the block's fill byte, the loser's fragment is patched
    two = bytes(600_000) + b"\xff" * 600_000 + b"END!"
    frame3 = compress(two, block_max_code=7)
    assert decompress_device(frame3) == two


def test_decompress_to_device(vectors_dir):
    """Device-resident decode: output stays a jax.Array in HBM and is
    bit-exact; checksum verification still reference-parity."""
    import jax
    import jax.numpy as jnp

    import lz4tpu

    for name in ("t100k", "skipz100", "z101legacyplus"):
        data = (vectors_dir / f"{name}.lz4").read_bytes()
        ref = (vectors_dir / f"{name}.bin").read_bytes()
        out = lz4tpu.decompress_to_device(data, interpret=True)
        assert isinstance(out, jax.Array) and out.dtype == jnp.uint8
        assert bytes(jax.device_get(out).tobytes()) == ref
    # verify="host" catches a corrupted content checksum
    bad = bytearray((vectors_dir / "t100k.lz4").read_bytes())
    bad[-1] ^= 0xFF
    with pytest.raises(Lz4Error):
        lz4tpu.decompress_to_device(bytes(bad), interpret=True)
    # verify="none" skips checksum verification but still validates
    # the sequence grammar
    out = lz4tpu.decompress_to_device(bytes(bad), interpret=True,
                                      verify="none")
    assert out.shape[0] == 102400


def test_xxh32_segment_chain(monkeypatch):
    """The fixed-shape segment hasher must match the reference digest
    across segment boundaries, partial final segments, and stripe
    tails.  Shrink the segment/fetch thresholds so the chain runs in
    interpret mode on small data."""
    import jax.numpy as jnp

    from lz4tpu.device import xxh32_pallas as xp
    from lz4tpu.xxh32 import xxh32

    monkeypatch.setattr(xp, "_SEG_BYTES", 1 << 15)     # 32 KiB segments
    monkeypatch.setattr(xp, "_SMALL_FETCH", 1 << 14)
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 200_000, dtype=np.uint8)
    arr = jnp.asarray(data)
    for lo, hi in ((0, 200_000), (7, 199_003), (100, 100 + (1 << 15)),
                   (5, 5 + (1 << 15) + 13), (0, 16), (3, 3)):
        got = xp.xxh32_of_device_array(arr, lo, hi, interpret=True)
        want = xxh32(data[lo:hi].tobytes())
        assert got == want, (lo, hi)


def test_decompress_to_device_verify_device(vectors_dir):
    """verify="device": content checksums computed by the Pallas xxh32
    stripe kernel over the HBM-resident output; decoded bytes never
    fetched.  Same acceptance and same reference-parity rejection as
    the host verifier."""
    import jax

    import lz4tpu

    for name in ("t100k", "concat390", "z2841", "z1", "emptycraft"):
        data = (vectors_dir / f"{name}.lz4").read_bytes()
        ref = (vectors_dir / f"{name}.bin").read_bytes()
        out = lz4tpu.decompress_to_device(data, interpret=True,
                                          verify="device")
        assert bytes(jax.device_get(out).tobytes()) == ref
    # corrupted content checksum raises the same parity error
    bad = bytearray((vectors_dir / "t100k.lz4").read_bytes())
    bad[-1] ^= 0xFF
    with pytest.raises(Lz4Error) as ei_dev:
        lz4tpu.decompress_to_device(bytes(bad), interpret=True,
                                    verify="device")
    with pytest.raises(Lz4Error) as ei_host:
        lz4tpu.decompress_to_device(bytes(bad), interpret=True,
                                    verify="host")
    assert ei_dev.value.ada_image() == ei_host.value.ada_image()


def test_sparse_classifier_rejections():
    """The sparse builder must return None (caller falls back) for
    chains that are not sparse-shaped: deep pattern chains, segment
    blowup, and overlapping matches needing too many chunks."""
    import numpy as np

    from lz4tpu.device import sparse_decode as sp

    buf = np.arange(256, dtype=np.uint8)

    def prog(ll, ml, mo, ls):
        return sp.build_sparse_program(
            np.asarray(ll, np.int32), np.asarray(ml, np.int32),
            np.asarray(mo, np.int32), np.asarray(ls, np.int32), buf,
        )

    # pattern chain deeper than the resolver cap: each seq's small-
    # offset match reaches into the previous fill's pattern
    n = 40
    ll = [1] + [0] * (n - 1)
    ml = [0] + [8] * (n - 1)
    mo = [1] + [5] * (n - 1)
    ls = [0] * n
    assert prog(ll, ml, mo, ls) is None

    # segment blowup: more ops than MAX_OPS
    n = sp.MAX_OPS + 2
    assert prog([1] * n, [0] * n, [1] * n, [0] * n) is None

    # overlapping large-offset match expanding into too many chunks
    ll = [300, 0]
    ml = [0, 300 * (sp.MAX_SELF_CHUNKS + 2)]
    mo = [1, 300]
    ls = [0, 0]
    assert prog(ll, ml, mo, ls) is None

    # and a healthy RLE-ish chain still classifies
    assert prog([4, 0], [0, 5000], [1, 4], [0, 0]) is not None


def test_forced_resolver_engine(vectors_dir):
    """engine="resolve" (byte-parallel XLA resolver) decodes bit-exact
    — the correctness-engine contract the sharded fallback relies on."""
    data = (vectors_dir / "t100k.lz4").read_bytes()
    ref = (vectors_dir / "t100k.bin").read_bytes()
    assert decompress_device(data, engine="resolve") == ref


def test_plan_overflow_isolation_multi_chain(vectors_dir):
    """A fused-class chain concatenated with a budget-overflowing chain:
    plan_decode must isolate the offender per chain (the good chain
    keeps the fused engine, the offender falls to the host-pack dense
    engine) and the public pipeline stays bit-exact."""
    from lz4tpu.constants import FOR_ALL
    from lz4tpu.frame import parse_frames
    from lz4tpu.pipeline import DecodeStats, build_seq_table, plan_decode

    good = (vectors_dir / "t100k.lz4").read_bytes()
    # the offender needs > _SPARSE_MAX_SEQS sequences (text prefix) AND
    # a guaranteed patch-budget overflow (the offset-2 run)
    text = (vectors_dir / "t100k.bin").read_bytes()[:50_000]
    bad_payload = text + b"ab" * 120_000
    data = good + compress(bad_payload)
    ref = (vectors_dir / "t100k.bin").read_bytes() + bad_payload

    buf = np.frombuffer(data, np.uint8)
    parsed = parse_frames(buf, FOR_ALL)
    table = build_seq_table(buf, parsed, FOR_ALL, data)
    st = DecodeStats()
    plan = plan_decode(buf, parsed, table, st)
    assert len(plan.fused_chains) == 1
    assert len(plan.dense_chains) == 1
    assert decompress_device(data, interpret=True) == ref
