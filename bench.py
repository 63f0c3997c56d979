"""Benchmark: LZ4 decode throughput per chip on the reference's large
vectors (z9m.lz4 + t1111k.lz4 + b3444k.lz4), per driver BASELINE.json.

Robustness contract (round-4: round 3's number was LOST to a tunnel
outage — BENCH_r03.json recorded rc=124 and no JSON line)
----------------------------------------------------------------------
``python bench.py`` runs a SUPERVISOR that never imports jax and always
prints exactly one JSON line, then exits 0:

* it spawns the measurement CHILD (``bench.py --child``) in its own
  process group with an absolute wall-clock deadline
  (``LZ4TPU_BENCH_DEADLINE`` seconds overall, default 780 — chosen to
  sit well under the driver's kill timeout);
* the child persists a JSONL event per completed vector as it goes and
  budgets every phase (backend wait, slope attempts, sustained section)
  against its share of the deadline;
* on child success the supervisor prints the child's complete payload;
* on deadline, child crash, or an external SIGTERM/SIGINT (the driver's
  ``timeout`` sends SIGTERM first) the supervisor kills the child group
  and prints a PARTIAL payload aggregated over whichever vectors
  finished, flagged ``"incomplete": true`` with a ``note``;
* if nothing finished at all it falls back to the last complete run's
  committed payload (BENCH_CACHE.json) flagged ``"stale_cache": true``
  and ``"measured_this_run": false`` — a labeled stale number instead of
  silence — or a zero-value line if no cache exists.

``vs_target`` (value / 3.0 GB/s, the BASELINE.md per-chip north star)
rides alongside ``vs_baseline`` on every path so an above-Ada aggregate
can never read as "done" while the named vectors miss the target.

Accounting (round-2: the round-1 verdict required the timed region to
start right after the token scan, with all provenance work inside it)
---------------------------------------------------------------------
Per vector, one request costs

  t_total = t_prep + t_device

* ``t_prep``  — HOST work after the native token scan: the decode plan
  (chain classification, fused-engine sequence/patch records, sparse
  programs).  With the fused engine this is O(sequences), not
  O(output bytes); it is re-executed and timed per iteration.
* ``t_device`` — the device computation decoding the whole corpus to
  HBM-resident output, interleaved-chain slope-timed (see below).

Excluded and why:
* frame parse + native token scan: O(compressed) streaming work the
  verdict's accounting explicitly leaves ahead of the timed region.
* host<->device transfers: this machine reaches the TPU through a
  development tunnel moving ~20 MB/s with ~2 ms/transfer — three
  orders of magnitude below production PCIe/DMA.  The per-request
  input volume is printed per vector (bytes_shipped) so the production
  transfer cost (~0.5 ms at 10 GB/s for the largest vector) can be
  judged directly rather than measured through the tunnel.

Device timing: the tunnel chip's effective clock drifts up to 2x
between processes and within minutes, and a host sync costs ~30 ms of
tunnel jitter, so each vector's device time is a two-point slope
(chained executions inside one jit via ring/data dependencies), median
of five, after a sustained warm-up — never a single wall-clock reading
(CLAUDE.md measurement rules).

Correctness is asserted outside the timed region: every vector's
device output is compared bit-for-bit against the host engine (which
the vector suite pins against the reference).

vs_baseline: the reference Ada library (single Xeon core, hyperfine
mode — BASELINE.md) decodes zeros at 2094 MiB/s, text at 1099 MiB/s,
and random at 1109 MiB/s.  The aggregate reference rate over this
corpus is total_bytes / sum(size_i / rate_i); vs_baseline is our
aggregate over it.

Sustained (pipelined) numbers: in the DecodeSession deployment shape
the prep thread preps request N+1 while the device decodes request N,
so the steady-state rate is min(host-stage rate, device rate).  The
host stage is the serial resource on this one-core box; it
parallelizes across chains/substep ranges on multi-core hosts
(LZ4TPU_PACK_THREADS — the partitioning is pinned by
tests/test_prep_threads.py, which instruments the native phase
counters; the modeled N-core bound printed here is serial_floor /
min(N, chains)).
"""

from __future__ import annotations

import json
import os
import pathlib
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

VECTOR_DIR = pathlib.Path(
    os.environ.get("LZ4TPU_VECTORS", "/root/reference/test_vectors_lz4")
)
VECTORS = ["z9m", "t1111k", "b3444k"]
REF_MIBS = {"z9m": 2094.0, "t1111k": 1099.0, "b3444k": 1109.0}
TARGET_GBPS = 3.0          # BASELINE.md: >= 3 GB/s/chip on z9m/t1111k
REPS = int(os.environ.get("LZ4TPU_BENCH_REPS", "6"))
SUSTAINED_ROUNDS = int(os.environ.get("LZ4TPU_BENCH_SUSTAINED", "24"))
# Overall wall budget for the WHOLE benchmark (supervisor-enforced).
DEADLINE_S = float(os.environ.get("LZ4TPU_BENCH_DEADLINE", "780"))
# The dev tunnel's TPU backend has transient outages (minutes to
# hours).  The child waits for it within its budget; the supervisor's
# deadline guarantees a JSON line lands regardless.
BACKEND_WAIT_S = float(os.environ.get("LZ4TPU_BENCH_BACKEND_WAIT", "600"))
REPO = pathlib.Path(__file__).resolve().parent
CACHE_PATH = pathlib.Path(
    os.environ.get("LZ4TPU_BENCH_CACHE", str(REPO / "BENCH_CACHE.json"))
)
METRIC = "lz4_decode_post_scan_z9m_t1111k_b3444k"


# ---------------------------------------------------------------------------
# payload math (shared by the child's final line and the supervisor's
# partial/fallback lines)
# ---------------------------------------------------------------------------

def compose_payload(vectors, sustained=None):
    """Aggregate per-vector results into the driver JSON payload.

    ``vectors``: dicts with name, n_out, t_prep_ms, t_dev_ms (only
    completed vectors).  Aggregate rate = total bytes / total time over
    the vectors present; vs_baseline uses the same subset of the
    reference per-corpus rates so a partial run stays apples-to-apples.

    Hygiene (round-4 verdict weak-#3): a vector whose device slope was
    FLOORED under an unstable clock is dropped from the aggregate and
    flagged in ``vectors_excluded`` — a floored sample must never ride
    the denominator; and the payload carries ``per_vector`` rows
    (rate, per-vector vs_target, slope spread across the interleaved
    rounds) so the named vectors cannot hide inside the aggregate.
    """
    ok = [v for v in vectors if not v.get("floored")]
    bad = [v for v in vectors if v.get("floored")]
    total_bytes = sum(v["n_out"] for v in ok)
    agg_t = sum(v["t_prep_ms"] + v["t_dev_ms"] for v in ok) / 1e3
    t_ref = sum(
        v["n_out"] / (REF_MIBS[v["name"]] * 1024 * 1024) for v in ok
    )
    gbps = total_bytes / agg_t / 1e9 if agg_t > 0 else 0.0
    ref_gbps = total_bytes / t_ref / 1e9 if t_ref > 0 else 1.0
    payload = {
        "metric": METRIC,
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / ref_gbps, 4) if ref_gbps else 0.0,
        "vs_target": round(gbps / TARGET_GBPS, 4),
    }
    per_vec = []
    for v in vectors:
        t_total = (v["t_prep_ms"] + v["t_dev_ms"]) / 1e3
        row = {
            "name": v["name"],
            "gbps": round(v["n_out"] / t_total / 1e9, 4) if t_total
            else 0.0,
            "gbps_dev": round(
                v["n_out"] / (v["t_dev_ms"] / 1e3) / 1e9, 4
            ) if v["t_dev_ms"] else 0.0,
            "vs_target": round(
                v["n_out"] / t_total / 1e9 / TARGET_GBPS, 4
            ) if t_total else 0.0,
            "t_prep_ms": round(v["t_prep_ms"], 3),
            "t_dev_ms": round(v["t_dev_ms"], 4),
        }
        for k in ("t_dev_ms_min", "t_dev_ms_max", "t_prep_ms_min",
                  "t_prep_ms_max", "slope_rounds"):
            if k in v:
                row[k] = v[k]
        if v.get("floored"):
            row["floored"] = True
        per_vec.append(row)
    payload["per_vector"] = per_vec
    if bad:
        payload["vectors_excluded"] = [v["name"] for v in bad]
        payload["note_excluded"] = (
            "device slope floored under unstable clock; dropped from "
            "the aggregate"
        )
    if sustained:
        h, e = sustained
        payload["sustained_hostbound_gbps"] = round(h, 4)
        payload["sustained_hostbound_vs_baseline"] = round(
            h / ref_gbps, 4)
        payload["sustained_tunnel_e2e_gbps"] = round(e, 4)
    return payload


def _read_events(path):
    events = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        events.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass    # torn final write
    except OSError:
        pass
    return events


def _partial_payload(events, note):
    # dedup by name, keeping the LAST measurement (a mid-run re-exec
    # after a tunnel outage re-measures vectors into the same file)
    by_name = {}
    for e in events:
        if e.get("event") == "vector":
            by_name[e["name"]] = e
    vectors = [by_name[n] for n in VECTORS if n in by_name]
    final = [e for e in events if e.get("event") == "final"]
    if final:
        payload = dict(final[0]["payload"])
        payload["incomplete"] = True
        payload["note"] = note
        return payload
    if vectors:
        sustained = None
        for e in events:
            if e.get("event") == "sustained":
                sustained = (e["hostbound_gbps"], e["e2e_gbps"])
        payload = compose_payload(vectors, sustained)
        payload["incomplete"] = True
        payload["vectors_measured"] = [v["name"] for v in vectors]
        payload["note"] = note
        return payload
    # nothing measured: labeled stale cache beats silence
    try:
        cached = json.loads(CACHE_PATH.read_text())
    except (OSError, json.JSONDecodeError):
        cached = None
    if cached and "value" in cached:
        payload = dict(cached)
        payload["incomplete"] = True
        payload["stale_cache"] = True
        payload["measured_this_run"] = False
        payload["note"] = note
        return payload
    return {
        "metric": METRIC, "value": 0.0, "unit": "GB/s/chip",
        "vs_baseline": 0.0, "vs_target": 0.0,
        "incomplete": True, "measured_this_run": False, "note": note,
    }


# ---------------------------------------------------------------------------
# supervisor: deadline + signal safety, exactly one stdout JSON line
# ---------------------------------------------------------------------------

def supervise() -> int:
    t0 = time.time()
    deadline = t0 + DEADLINE_S
    # seconds kept to compose + print (scaled down for short test
    # deadlines so the child still gets a slice of a tiny budget)
    reserve = min(10.0, max(0.5, DEADLINE_S / 6.0))
    fd, progress = tempfile.mkstemp(prefix="lz4tpu_bench_", suffix=".jsonl")
    os.close(fd)
    child_log = progress + ".childlog"
    env = dict(os.environ)
    env["LZ4TPU_BENCH_CHILD_DEADLINE"] = str(deadline - reserve)
    # child stdout -> log file (the ONE stdout JSON line is ours);
    # stderr inherited so progress remains visible in driver tails
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", progress],
        stdout=open(child_log, "w"),
        env=env,
        start_new_session=True,
    )

    done = {"emitted": False}

    def emit_and_exit(payload, rc=0):
        if not done["emitted"]:
            done["emitted"] = True
            print(json.dumps(payload), flush=True)
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        os._exit(rc)

    def on_signal(signum, _frame):
        note = f"killed by signal {signum} after {time.time()-t0:.0f}s"
        print(f"bench supervisor: {note}; emitting partial payload",
              file=sys.stderr)
        emit_and_exit(_partial_payload(_read_events(progress), note))

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    rc = None
    while True:
        remaining = (deadline - reserve) - time.time()
        if remaining <= 0:
            note = f"deadline ({DEADLINE_S:.0f}s) reached; child killed"
            print(f"bench supervisor: {note}", file=sys.stderr)
            emit_and_exit(_partial_payload(_read_events(progress), note))
        try:
            rc = child.wait(timeout=min(2.0, remaining))
            break
        except subprocess.TimeoutExpired:
            continue

    events = _read_events(progress)
    final = [e for e in events if e.get("event") == "final"]
    if rc == 0 and final:
        payload = final[0]["payload"]
        print(json.dumps(payload), flush=True)
        if not payload.get("incomplete"):
            try:
                cache = dict(payload)
                cache["cached_at"] = time.strftime(
                    "%Y-%m-%dT%H:%M:%S%z")
                CACHE_PATH.write_text(json.dumps(cache, indent=1) + "\n")
            except OSError:
                pass
        return 0
    note = f"child exited rc={rc} without a final payload"
    print(f"bench supervisor: {note}", file=sys.stderr)
    emit_and_exit(_partial_payload(events, note))
    return 0    # unreachable


# ---------------------------------------------------------------------------
# child: the actual measurement (event-sourced, budget-aware)
# ---------------------------------------------------------------------------

class _Progress:
    def __init__(self, path):
        self.f = open(path, "a", buffering=1)

    def emit(self, **obj):
        self.f.write(json.dumps(obj) + "\n")
        self.f.flush()
        os.fsync(self.f.fileno())


def _child_deadline() -> float:
    return float(os.environ.get(
        "LZ4TPU_BENCH_CHILD_DEADLINE", time.time() + DEADLINE_S))


def _remaining() -> float:
    return _child_deadline() - time.time()


def wait_for_backend(max_wait: float | None = None) -> None:
    """Block until a JAX backend initializes in a probe subprocess.

    The probe runs in a child so a failed init is never cached in this
    process's xla_bridge state.  Bounded by both BACKEND_WAIT_S and the
    child deadline (minus a margin for the measurement itself)."""
    if max_wait is None:
        max_wait = min(BACKEND_WAIT_S, max(0.0, _remaining() - 120.0))
    deadline = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        # DEVNULL (a captured pipe held open by a tunnel-client
        # grandchild blocks the post-kill drain forever) + own session
        # so the timeout kill reaches the whole probe process group.
        proc = subprocess.Popen(
            [sys.executable, "-c", "import jax; jax.devices()"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        try:
            probe_budget = min(120.0, max(5.0, deadline - time.time()))
            if proc.wait(timeout=probe_budget) == 0:
                if attempt > 1:
                    print("backend up after %d probes" % attempt,
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
        if time.time() > deadline:
            print("backend still unavailable after %.0fs; proceeding"
                  % max_wait, file=sys.stderr)
            return
        print("JAX backend unavailable (probe %d); retrying in 30s"
              % attempt, file=sys.stderr)
        time.sleep(30)


def bench_sustained(datas, sync_probe):
    """Steady-state pipelined throughput (serve.DecodeSession shape).

    Two numbers, both printed (see module docstring): the measured
    serial host-stage bound (the pipeline's sustained rate per host
    core — the device stage hides behind it on production hardware)
    and the end-to-end rate through THIS box's ~20 MB/s dev tunnel.
    Also prints the modeled N-core host-stage bound (the partitioning
    it assumes is pinned by tests/test_prep_threads.py)."""
    from lz4tpu import FOR_ALL, decompress_host
    from lz4tpu.frame import parse_frames
    from lz4tpu.pipeline import build_seq_table, plan_decode
    from lz4tpu.serve import DecodeSession

    # ---- host-stage bound (the serial resource) ----
    total = sum(len(decompress_host(d)) for d in datas)
    for _ in range(2):      # warm
        for data in datas:
            buf = np.frombuffer(data, np.uint8)
            parsed = parse_frames(buf, FOR_ALL)
            table = build_seq_table(buf, parsed, FOR_ALL, data,
                                    pooled_cols=True)
            plan_decode(buf, parsed, table)
    rounds = max(5, SUSTAINED_ROUNDS // 4)
    if _remaining() < 120:
        rounds = max(3, rounds // 2)
    per_round = []
    for _ in range(rounds):
        t0 = time.time()
        for data in datas:
            buf = np.frombuffer(data, np.uint8)
            parsed = parse_frames(buf, FOR_ALL)
            table = build_seq_table(buf, parsed, FOR_ALL, data,
                                    pooled_cols=True)
            plan_decode(buf, parsed, table)
        per_round.append(time.time() - t0)
    # median round: the single core is shared, spikes are the VM's
    host_dt = sorted(per_round)[len(per_round) // 2]
    host_gbps = total / host_dt / 1e9
    print(
        f"sustained host-stage bound (parse+scan+plan+prep, 1 core): "
        f"{host_gbps:.3f} GB/s ({host_dt * 1e3:.1f} ms/corpus round); "
        f"modeled multi-core bound (test-pinned partitioning): "
        f"2 cores {2 * host_gbps:.2f}, 4 cores {4 * host_gbps:.2f} GB/s",
        file=sys.stderr,
    )

    # ---- measured end-to-end (tunnel-bound on this box) ----
    n_rounds = max(2, SUSTAINED_ROUNDS // 8)
    with DecodeSession(max_inflight=4) as s:
        for data in datas:   # correctness + compile warm-up
            assert s.submit(data).result() == decompress_host(data)
        t0 = time.time()
        tickets = []
        last = None
        for b in datas * n_rounds:
            while len(tickets) >= 4:
                last = tickets.pop(0).result_on_device(verify="none")
            tickets.append(s.submit(b))
        for t in tickets:
            last = t.result_on_device(verify="none")
        sync_probe(last)
        dt = (time.time() - t0) / n_rounds
    e2e_gbps = total / dt / 1e9
    print(
        f"sustained measured end-to-end through the dev tunnel "
        f"(~20 MB/s staging link): {e2e_gbps:.3f} GB/s",
        file=sys.stderr,
    )
    return host_gbps, e2e_gbps


def _fake_child(progress: _Progress) -> int:
    """Test hook (LZ4TPU_BENCH_FAKE=1): exercise the supervisor's
    event plumbing without a backend.  Emits synthetic vector events
    with configurable pacing, then optionally hangs."""
    delay = float(os.environ.get("LZ4TPU_BENCH_FAKE_DELAY", "0"))
    hang_after = os.environ.get("LZ4TPU_BENCH_FAKE_HANG_AFTER")
    mark_path = os.environ.get("LZ4TPU_BENCH_FAKE_MARK")
    fake_n = {"z9m": 9437166, "t1111k": 1111000, "b3444k": 3444000}
    vectors = []
    for name in VECTORS:
        time.sleep(delay)
        v = dict(event="vector", name=name, n_out=fake_n[name],
                 t_prep_ms=1.0, t_dev_ms=1.0)
        progress.emit(**v)
        vectors.append(v)
        if mark_path:
            # deterministic test sync: the SIGTERM test polls this
            # file instead of guessing how long child startup takes
            with open(mark_path, "a") as f:
                f.write(name + "\n")
        if hang_after == name:
            time.sleep(1e6)
    payload = compose_payload(vectors)
    progress.emit(event="final", payload=payload)
    print(json.dumps(payload))
    return 0


def child_main(progress_path: str) -> int:
    progress = _Progress(progress_path)
    if os.environ.get("LZ4TPU_BENCH_FAKE") == "1":
        return _fake_child(progress)

    wait_for_backend()

    import jax
    import jax.numpy as jnp

    from lz4tpu import FOR_ALL, decompress_host
    from lz4tpu.device import fused as fu
    from lz4tpu.device import sparse_decode as sp
    from lz4tpu.frame import parse_frames
    from lz4tpu.pipeline import build_seq_table, plan_decode

    def sync_probe(x):
        # block_until_ready does not sync through the axon tunnel;
        # force a scalar round trip (CLAUDE.md)
        return int(jax.device_get(jnp.sum(x.ravel()[:1].astype(jnp.int32))))

    per_vec = []
    for name in VECTORS:
        if _remaining() < 45:
            print(f"{name}: skipped ({_remaining():.0f}s left)",
                  file=sys.stderr)
            continue
        data = (VECTOR_DIR / f"{name}.lz4").read_bytes()
        buf = np.frombuffer(data, dtype=np.uint8)
        parsed = parse_frames(buf, FOR_ALL)
        table = build_seq_table(buf, parsed, FOR_ALL, data,
                                pooled_cols=True)
        n_out = table.n_out

        # ---- timed host stage: plan + fused/sparse prep -------------
        # median of 7: this box's single core is SHARED (noisy
        # neighbors swing wall time 2-3x run to run); the median is
        # the honest per-request cost, the spikes are the VM's
        plan = plan_decode(buf, parsed, table)
        samples = []
        for _ in range(7):
            t0 = time.time()
            plan = plan_decode(buf, parsed, table)
            samples.append(time.time() - t0)
        t_prep = sorted(samples)[3]
        prep_min, prep_max = min(samples), max(samples)
        assert not plan.other, f"{name}: chain fell off the fast paths"
        assert not plan.dense_chains, f"{name}: fused overflow -> mxu2"

        # ---- stage device inputs (transfers excluded, see docstring)
        shipped = 0
        comp_dev = jnp.asarray(buf)
        shipped += buf.nbytes
        sparse_progs = [(c, p) for c, p in plan.sparse]
        fp = plan.fused_prep
        fargs = None
        if fp is not None:
            arrs = (fp.seqrec, fp.lits, fp.winq, fp.scal, fp.patch)
            shipped += sum(a.nbytes for a in arrs)
            fargs = tuple(jnp.asarray(a) for a in arrs)

        rp = fu.fused_rpages(fp.max_off) if fp is not None else fu.RPAGES
        sq = fu.fused_seqrows(fp.max_recs) if fp is not None else 8

        def decode_once(comp, fa, ring):
            """One full decode of the vector to HBM-resident output."""
            outs = tuple(
                sp._compile_program(prog.ops, prog.n_out)(comp)
                for _c, prog in sparse_progs
            )
            rows = ()
            if fa:
                seqrec, lits, winq, scal, patch = fa
                r, ring = fu._decode_fused_device(
                    seqrec, lits, winq, scal, patch, ring,
                    n_sub=fp.n_sub, rpages=rp, seq_rows=sq,
                )
                rows = (r,)
            return outs, rows, ring

        ring0 = jnp.zeros((rp, fu.ROWB), jnp.bfloat16)
        outs0, rows0, _ = jax.eval_shape(
            decode_once, jax.ShapeDtypeStruct(comp_dev.shape,
                                              comp_dev.dtype),
            fargs, ring0)
        zeros = lambda tree: jax.tree_util.tree_map(  # noqa: E731
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

        @jax.jit
        def decode_chain(comp, reps, *fa):
            """reps decodes chained INSIDE one jit by data dependencies
            (ring carry + an opaque zero mixed into the inputs), so one
            timed call is one dispatch: the slope measures pure device
            time even when the dev tunnel's dispatch latency spikes
            (observed: a ms-scale per-dispatch floor that swamped
            per-decode times measured as queued separate dispatches).

            ``reps`` is DYNAMIC and the final iteration's outputs ride
            in the carry, so correctness (reps=1) and every slope point
            share ONE compiled program — the tunnel's compile service
            has slow days (observed 3-5 min per program vs the usual
            20-40 s), and the old shape (a correctness program plus one
            chain program per static reps value = 4 compiles/vector)
            blew the whole 780 s deadline before measuring anything."""
            probe0 = jnp.zeros((), jnp.int32)

            def body(_k, carry):
                probe, ring, _outs, _rows = carry
                # the barrier makes the carry opaque: without it XLA's
                # range analysis proves min(probe, 0) == 0 (probe
                # accumulates uint8 casts), folds the data dependency,
                # and dead-codes the whole body — observed as z9m
                # "decoding" at 1.1 TB/s
                probe, ring = jax.lax.optimization_barrier(
                    (probe, ring))
                z = jnp.minimum(probe, 0).astype(jnp.uint8)
                c = comp + z           # runtime-identical to comp
                outs, rows, ring = decode_once(c, fa, ring)
                # a probe of o[0] alone is NOT enough for pure-XLA
                # copy/fill programs: XLA peels the loop and elides the
                # copy on every non-final iteration (exp/r4_live_probe:
                # b3444k "measured" -10.7 us/decode, i.e. nothing).
                # The barrier forces each iteration's outputs to
                # materialize; measured cost matches the HBM copy
                # roofline.  Pallas outputs (rows) are opaque anyway.
                if outs or rows:
                    outs, rows = jax.lax.optimization_barrier(
                        (outs, rows))
                for o in outs:
                    # accumulate REAL bytes so the decode stays live
                    probe = probe + o[0].astype(jnp.int32)
                for r in rows:
                    probe = probe + r[0, 0].astype(jnp.int32)
                return probe, ring, outs, rows

            probe, _ring, outs, rows = jax.lax.fori_loop(
                0, reps, body,
                (probe0, ring0, zeros(outs0), zeros(rows0)))
            return probe, outs, rows

        def run_n(reps):
            return decode_chain(comp_dev, jnp.int32(reps),
                                *(fargs or ()))[0]

        # correctness gate (outside timing; same compiled program)
        _probe, outs, rows = decode_chain(comp_dev, jnp.int32(1),
                                          *(fargs or ()))
        rows = rows[0] if rows else None
        res = bytearray(n_out)
        for (chain, _p), o in zip(sparse_progs, outs):
            n_c = chain.out_hi - chain.out_lo
            res[chain.out_lo:chain.out_hi] = np.asarray(
                jax.device_get(o))[:n_c].tobytes()
        if fp is not None:
            flat = np.asarray(jax.device_get(rows)).reshape(-1)
            for chain, (_c, slo, _shi, out_len) in zip(
                plan.fused_chains, fp.out_spans
            ):
                res[chain.out_lo:chain.out_hi] = flat[
                    slo * fu.SUB: slo * fu.SUB + out_len
                ].tobytes()
        assert bytes(res) == decompress_host(data), f"{name}: mismatch"

        # ---- device slope timing ------------------------------------
        def timed(reps):
            t0 = time.time()
            sync_probe(run_n(reps))
            return time.time() - t0

        timed(2)
        timed(REPS)
        # full protocol when time allows; a reduced one (fewer settle
        # iterations, 3 slopes, 1 attempt) when the deadline looms
        tight = _remaining() < 150
        attempts = 2 if tight else 3
        n_slopes = 3 if tight else 5
        settle_iters = 3 if tight else 10
        t_dev = None
        slopes = []
        reps_v = REPS
        for _attempt in range(attempts):
            t_prev = timed(reps_v)
            for _ in range(settle_iters):
                t_now = timed(reps_v)
                if t_now >= t_prev * 0.97:
                    break
                t_prev = t_now
            slopes = []
            for _ in range(n_slopes):
                t_small = timed(reps_v)
                t_big = timed(4 * reps_v)
                slopes.append((t_big - t_small) / (3 * reps_v))
            sane = sorted(s for s in slopes if s > 1e-6)
            # a majority of sane slopes carries the median; otherwise
            # the decode is too fast for this rep count against the
            # tunnel's sync jitter (z9m/b3444k run ~0.1 ms) — SCALE
            # REPS UP 4x and retry rather than flooring (round-4
            # verdict weak-#3: BENCH_r04 aggregated a floored sample)
            if len(sane) * 2 > len(slopes):
                t_dev = sane[len(sane) // 2]
                break
            t_dev = sorted(slopes)[len(slopes) // 2]
            reps_v = min(reps_v * 4, 512)
        # A still-floored sample is flagged and EXCLUDED from the
        # aggregate by compose_payload (round-4 verdict weak-#3: a
        # floored device time must never ride the denominator).
        floored = t_dev is None or t_dev <= 1e-6
        if floored:
            t_dev = max(t_dev or 0.0, 1e-6)
            print(f"{name}: WARNING unstable clock; device slope "
                  "floored -> vector excluded from the aggregate",
                  file=sys.stderr)

        t_total = t_prep + t_dev
        sane = sorted(s for s in slopes if s > 0) or [t_dev]
        v = dict(
            event="vector", name=name, n_out=n_out,
            t_prep_ms=t_prep * 1e3, t_dev_ms=t_dev * 1e3,
            t_prep_ms_min=round(prep_min * 1e3, 3),
            t_prep_ms_max=round(prep_max * 1e3, 3),
            t_dev_ms_min=round(sane[0] * 1e3, 4),
            t_dev_ms_max=round(sane[-1] * 1e3, 4),
            slope_rounds=len(slopes),
            gbps=n_out / t_total / 1e9,
            gbps_dev=n_out / t_dev / 1e9,
            shipped_mb=shipped / 1e6,
        )
        if floored:
            v["floored"] = True
        per_vec.append(v)
        progress.emit(**v)
        print(
            f"{name}: {n_out} B  prep {t_prep*1e3:.2f} ms + device "
            f"{t_dev*1e3:.2f} ms -> {n_out/t_total/1e9:.3f} GB/s "
            f"(device-only {n_out/t_dev/1e9:.2f}; ships "
            f"{shipped/1e6:.1f} MB/request)",
            file=sys.stderr,
        )

    sustained = None
    if per_vec and len(per_vec) == len(VECTORS) and _remaining() > 60:
        datas = [(VECTOR_DIR / f"{n}.lz4").read_bytes() for n in VECTORS]
        sustained = bench_sustained(datas, sync_probe)
        progress.emit(event="sustained", hostbound_gbps=sustained[0],
                      e2e_gbps=sustained[1])
    elif per_vec:
        print("sustained section skipped (deadline)", file=sys.stderr)

    if not per_vec:
        print("no vector finished within budget", file=sys.stderr)
        return 3
    payload = compose_payload(per_vec, sustained)
    if len(per_vec) != len(VECTORS):
        payload["incomplete"] = True
        payload["vectors_measured"] = [v["name"] for v in per_vec]
        payload["note"] = "deadline: subset of vectors measured"
    progress.emit(event="final", payload=payload)
    print(json.dumps(payload))
    return 0


def _child_entry(progress_path: str) -> int:
    try:
        return child_main(progress_path)
    except RuntimeError as e:
        # Backend died mid-run (tunnel outage): JAX's backend state is
        # poisoned in-process, so re-exec for a clean retry.  Per-vector
        # progress persists across the re-exec (append mode), so the
        # supervisor's partial payload survives even a failed retry.
        attempt = int(os.environ.get("LZ4TPU_BENCH_ATTEMPT", "0"))
        if "UNAVAILABLE" not in str(e) or attempt >= 2 \
                or _remaining() < 90:
            raise
        print(f"backend lost mid-run ({e!r}); re-exec attempt "
              f"{attempt + 1}", file=sys.stderr)
        os.environ["LZ4TPU_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        sys.exit(_child_entry(sys.argv[2]))
    sys.exit(supervise())
