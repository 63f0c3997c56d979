"""The driver artifact (__graft_entry__.py) must keep working: entry()
returns a jittable forward decode step, and dryrun_multichip() runs the
full sharded decode (chain-sharded AND span-split monolithic) over the
8-device mesh.  The driver runs these out-of-suite; this pins them
in-suite so a refactor cannot silently break the round artifact.
"""

import jax
import numpy as np

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    arr = np.asarray(out)
    assert arr.size > 0
    # The CPU flagship is the byte-parallel resolver: its output is the
    # decoded byte stream, so it must reproduce the example payload.
    if jax.devices()[0].platform == "cpu":
        payload = (
            b"The TPU-native LZ4 codec decodes byte-parallel. " * 200
            + bytes(range(256)) * 8
        )
        assert arr[: len(payload)].astype(np.uint8).tobytes() == payload


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
