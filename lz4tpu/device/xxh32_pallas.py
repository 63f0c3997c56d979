"""Pallas TPU kernel: xxhash32 (reference: lib/lz4ada.adb:923-1026).

xxh32 is a sequentially chained hash: four u32 lane accumulators fed
16-byte stripes, then a serial avalanche. The chain dependency cannot
be parallelized (the update is not associative), so the TPU kernel is
a scalar loop over stripes with the four lanes unrolled — exactly the
reference's hot stripe loop (adb:979-991), executed on the TPU scalar
core over SMEM-streamed words.

Use cases and honest performance framing:

- *Per-block checksums* batch naturally (one grid cell per block) and
  keep verification on-device for device-resident pipelines.
- *Throughput* is scalar-core bound (~tens of ns per 16-byte stripe).
  For host-resident data the native C++ engine (lz4tpu/native) is much
  faster; the pipeline defaults to it and offers this kernel via
  ``verify="device"`` for data that should never leave HBM.

The kernel computes the full lane state; the final avalanche over the
<=15 tail bytes runs on the host (it touches a constant number of
bytes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..xxh32 import XXHash32

P1 = 2654435761
P2 = 2246822519
_WORDS_PER_STEP = 2048  # words of SMEM per grid step (8 KiB)


def _mul32(a, b):
    # int32 wrap-around multiply (TPU int ops wrap; keep dtypes tight)
    return (a * b).astype(jnp.int32)


def _rotl(v, r: int):
    u = v.astype(jnp.uint32)
    return (
        jax.lax.shift_left(u, jnp.uint32(r))
        | jax.lax.shift_right_logical(u, jnp.uint32(32 - r))
    ).astype(jnp.int32)


def _xxh32_kernel(nstripes_ref, words_ref, state_ref):
    """Accumulate lane state over this grid step's stripe words."""
    chunk = pl.program_id(0)
    base = chunk * (_WORDS_PER_STEP // 4)

    @pl.when(chunk == 0)
    def _():
        seed = jnp.int32(0)
        state_ref[0] = seed + jnp.int32(np.uint32((P1 + P2) & 0xFFFFFFFF).astype(np.int32))
        state_ref[1] = seed + jnp.int32(np.uint32(P2).astype(np.int32))
        state_ref[2] = seed
        state_ref[3] = seed - jnp.int32(np.uint32(P1).astype(np.int32))

    n_stripes = nstripes_ref[0]

    def body(i, _):
        @pl.when(base + i < n_stripes)
        def _():
            p2 = jnp.int32(np.uint32(P2).astype(np.int32))
            p1 = jnp.int32(np.uint32(P1).astype(np.int32))
            for lane in range(4):
                w = words_ref[i * 4 + lane]
                s = state_ref[lane]
                state_ref[lane] = _mul32(_rotl(s + _mul32(w, p2), 13), p1)
        return 0

    jax.lax.fori_loop(0, _WORDS_PER_STEP // 4, body, 0)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def _lane_state(nstripes, words, *, grid: int, interpret: bool):
    return pl.pallas_call(
        _xxh32_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (_WORDS_PER_STEP,), lambda c: (c,), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((4,), jnp.int32),
        interpret=interpret,
    )(nstripes, words)


def _finalize(state: np.ndarray, n: int, tail: bytes) -> int:
    """Fold the 4-lane state + <16-byte tail into the digest (host;
    constant work — reference: lz4ada.adb:993-1017)."""
    s0, s1, s2, s3 = (int(x) & 0xFFFFFFFF for x in state)

    def rotl(v, r):
        return ((v << r) | (v >> (32 - r))) & 0xFFFFFFFF

    h = (rotl(s0, 1) + rotl(s1, 7) + rotl(s2, 12) + rotl(s3, 18)) & 0xFFFFFFFF
    h = (h + n) & 0xFFFFFFFF
    i = 0
    P3, P4, P5 = 3266489917, 668265263, 374761393
    while i + 4 <= len(tail):
        w = int.from_bytes(tail[i:i + 4], "little")
        h = (rotl((h + w * P3) & 0xFFFFFFFF, 17) * P4) & 0xFFFFFFFF
        i += 4
    while i < len(tail):
        h = (rotl((h + tail[i] * P5) & 0xFFFFFFFF, 11) * P1) & 0xFFFFFFFF
        i += 1
    h ^= h >> 15
    h = (h * P2) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 3266489917) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def xxh32_device(data: np.ndarray, interpret: bool = False) -> int:
    """xxh32(seed=0) of a byte buffer with the stripe loop on device.

    Bit-exact with the reference; the tail (< 16 bytes) and avalanche
    fold run on the host.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.size
    n_stripes = n // 16
    if n_stripes == 0:
        return XXHash32().update(data.tobytes()).final()
    body = data[: n_stripes * 16]
    words = body.view("<u4").astype(np.int32)
    pad = (-words.size) % _WORDS_PER_STEP
    words = np.concatenate([words, np.zeros(pad, np.int32)])
    state = _lane_state(
        jnp.asarray(np.array([n_stripes], np.int32)),
        jnp.asarray(words),
        grid=words.size // _WORDS_PER_STEP,
        interpret=interpret,
    )
    return _finalize(
        np.asarray(jax.device_get(state)), n, data[n_stripes * 16:].tobytes()
    )


_SEG_BYTES = 8 << 20            # fixed hash segment: ONE compiled shape
_SMALL_FETCH = 8 << 20          # below this, fetching + native hash wins


def _xxh32_kernel_cont(nstripes_ref, words_ref, state_in_ref,
                       state_out_ref):
    """Like _xxh32_kernel but continues from a caller-provided lane
    state, so arbitrarily long streams hash as a chain of fixed-shape
    segment launches (compiled once)."""
    chunk = pl.program_id(0)
    base = chunk * (_WORDS_PER_STEP // 4)

    @pl.when(chunk == 0)
    def _():
        for lane in range(4):
            state_out_ref[lane] = state_in_ref[lane]

    n_stripes = nstripes_ref[0]

    def body(i, _):
        @pl.when(base + i < n_stripes)
        def _():
            p2 = jnp.int32(np.uint32(P2).astype(np.int32))
            p1 = jnp.int32(np.uint32(P1).astype(np.int32))
            for lane in range(4):
                w = words_ref[i * 4 + lane]
                s = state_out_ref[lane]
                state_out_ref[lane] = _mul32(_rotl(s + _mul32(w, p2), 13), p1)
        return 0

    jax.lax.fori_loop(0, _WORDS_PER_STEP // 4, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lane_state_segment(seg, n_stripes, state, *, interpret: bool):
    """Lane state after hashing `n_stripes` stripes of one fixed-size
    (_SEG_BYTES,) uint8 segment, continuing from `state`.  Fixed input
    shapes mean this traces and lowers the Pallas kernel exactly once
    per process, regardless of frame sizes/offsets."""
    b = seg.reshape(_SEG_BYTES // 4, 4).astype(jnp.int32)
    words = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    return pl.pallas_call(
        _xxh32_kernel_cont,
        grid=((_SEG_BYTES // 4) // _WORDS_PER_STEP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (_WORDS_PER_STEP,), lambda c: (c,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((4,), jnp.int32),
        interpret=interpret,
    )(n_stripes, words, state)


def xxh32_of_device_array(arr, lo: int, hi: int,
                          interpret: bool = False) -> int:
    """xxh32(seed=0) of arr[lo:hi] where arr is a device-resident uint8
    jax.Array — the content-checksum path for HBM-resident decode
    output (``decompress_to_device(verify="device")``).

    Large ranges hash as a chain of fixed-shape 8 MiB segment launches
    with carried lane state — one Pallas compilation per process, any
    number of frames/sizes/offsets — and only 16-byte lane states plus
    the <16-byte stripe tail cross the host<->device link.  Ranges
    under 8 MiB are simply fetched and hashed natively (moving a few MB
    costs less than a device launch chain buys).
    """
    import jax as _jax
    import jax.numpy as _jnp

    n = hi - lo
    if n <= 0:
        return XXHash32().final()
    if n < _SMALL_FETCH:
        seg = np.asarray(
            _jax.device_get(_jax.lax.dynamic_slice(arr, (lo,), (max(n, 1),)))
        )[:n]
        return XXHash32().update(seg.tobytes()).final()
    n_stripes = n // 16
    tail = np.asarray(
        _jax.device_get(
            _jax.lax.dynamic_slice(
                arr, (lo + n_stripes * 16,), (max(n - n_stripes * 16, 1),)
            )
        )
    )[: n - n_stripes * 16].tobytes()
    state = _jnp.asarray(np.array([     # seed = 0 lane init
        (P1 + P2) & 0xFFFFFFFF, P2, 0, (-P1) & 0xFFFFFFFF,
    ], dtype=np.uint32).astype(np.int32))
    seg_stripes_max = _SEG_BYTES // 16
    done = 0
    pos = lo
    while done < n_stripes:
        take = min(seg_stripes_max, n_stripes - done)
        if take == seg_stripes_max:
            # full segments slice straight out of arr (pos + seg <=
            # lo + n_stripes*16 <= arr.size); only the final partial
            # segment pads — never a whole-array copy (that doubled
            # peak HBM for the very path meant to avoid extra copies)
            seg = _jax.lax.dynamic_slice(arr, (pos,), (_SEG_BYTES,))
        else:
            seg = _jnp.concatenate([
                _jax.lax.dynamic_slice(arr, (pos,), (take * 16,)),
                _jnp.zeros(_SEG_BYTES - take * 16, _jnp.uint8),
            ])
        state = _lane_state_segment(
            seg, _jnp.full((1,), take, _jnp.int32), state,
            interpret=interpret,
        )
        done += take
        pos += take * 16
    return _finalize(np.asarray(_jax.device_get(state)), n, tail)
