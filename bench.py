"""Benchmark: LZ4 decode throughput per chip on the reference's large
vectors (z9m.lz4 + t1111k.lz4 + b3444k.lz4), per driver BASELINE.json.

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
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import sys
import time

import numpy as np

VECTOR_DIR = pathlib.Path(
    os.environ.get("LZ4TPU_VECTORS", "/root/reference/test_vectors_lz4")
)
VECTORS = ["z9m", "t1111k", "b3444k"]
REF_MIBS = {"z9m": 2094.0, "t1111k": 1099.0, "b3444k": 1109.0}
REPS = int(os.environ.get("LZ4TPU_BENCH_REPS", "6"))
SUSTAINED_ROUNDS = int(os.environ.get("LZ4TPU_BENCH_SUSTAINED", "24"))
# The dev tunnel's TPU backend has transient outages (minutes).  Wait
# for it to come back before starting the timed run so one outage
# doesn't turn the recorded benchmark into an import error.
BACKEND_WAIT_S = float(os.environ.get("LZ4TPU_BENCH_BACKEND_WAIT", "900"))


def wait_for_backend(max_wait: float = BACKEND_WAIT_S) -> None:
    """Block until a JAX backend initializes in a probe subprocess.

    The probe runs in a child so a failed init is never cached in this
    process's xla_bridge state.  Gives up (and lets main() surface the
    real error) after ``max_wait`` seconds.
    """
    import subprocess

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
            if proc.wait(timeout=150) == 0:
                if attempt > 1:
                    print("backend up after %d probes" % attempt,
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            import signal

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

    In the deployment shape the prep thread preps request N+1 while
    the device decodes request N, so the steady-state rate is set by
    the SLOWER stage.  Two numbers, both printed:

    * host-stage bound — measured serial host time per corpus round
      (frame parse + token scan + plan + fused prep; NOTHING excluded
      on the host side).  On production hardware the device stage
      (0.5-3 ms/request here) plus PCIe staging (~1 ms at 10 GB/s for
      the largest request) hides entirely behind this single-core
      stage, so this is the pipeline's sustained rate per host core.
    * measured end-to-end through DecodeSession on THIS box — recorded
      honestly but dominated by the dev tunnel (~20 MB/s host->device
      staging, ~8 MB shipped per corpus round), which production PCIe
      replaces; the gap between the two numbers is that link.
    """
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
        f"{host_gbps:.3f} GB/s ({host_dt * 1e3:.1f} ms/corpus round)",
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


def main() -> int:
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
    total_bytes = 0
    t_ref_total = 0.0
    agg_total_t = 0.0
    for name in VECTORS:
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

        @jax.jit
        def decode_corpus(comp, *fa):
            """One full decode of the vector to HBM-resident output."""
            outs = [
                sp._compile_program(prog.ops, prog.n_out)(comp)
                for _c, prog in sparse_progs
            ]
            rows = None
            if fa:
                seqrec, lits, winq, scal, patch = fa
                rows, _ring = fu._decode_fused_device(
                    seqrec, lits, winq, scal, patch, n_sub=fp.n_sub,
                    rpages=rp,
                )
            return outs, rows

        @functools.partial(jax.jit, static_argnames=("reps",))
        def decode_chain(comp, *fa, reps):
            """reps decodes chained INSIDE one jit by data dependencies
            (ring carry + an opaque zero mixed into the inputs), so one
            timed call is one dispatch: the slope measures pure device
            time even when the dev tunnel's dispatch latency spikes
            (observed: a ms-scale per-dispatch floor that swamped
            per-decode times measured as queued separate dispatches)."""
            ring0 = jnp.zeros((rp, fu.ROWB), jnp.bfloat16)
            probe0 = jnp.zeros((), jnp.int32)

            def body(_k, carry):
                probe, ring = carry
                # the barrier makes the carry opaque: without it XLA's
                # range analysis proves min(probe, 0) == 0 (probe
                # accumulates uint8 casts), folds the data dependency,
                # and dead-codes the whole body — observed as z9m
                # "decoding" at 1.1 TB/s
                probe, ring = jax.lax.optimization_barrier(
                    (probe, ring))
                z = jnp.minimum(probe, 0).astype(jnp.uint8)
                c = comp + z           # runtime-identical to comp
                for _c, prog in sparse_progs:
                    o = sp._compile_program(prog.ops, prog.n_out)(c)
                    # accumulate REAL bytes so the decode stays live
                    probe = probe + o[0].astype(jnp.int32)
                if fa:
                    seqrec, lits, winq, scal, patch = fa
                    rows, ring = fu._decode_fused_device(
                        seqrec, lits, winq, scal, patch, ring,
                        n_sub=fp.n_sub, rpages=rp,
                    )
                    probe = probe + rows[0, 0].astype(jnp.int32)
                return probe, ring

            probe, _ring = jax.lax.fori_loop(
                0, reps, body, (probe0, ring0))
            return probe

        def run_n(reps):
            return decode_chain(comp_dev, *(fargs or ()), reps=reps)

        # correctness gate (outside timing)
        outs, rows = decode_corpus(comp_dev, *(fargs or ()))
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
        t_dev = None
        for _attempt in range(3):
            t_prev = timed(REPS)
            for _ in range(10):
                t_now = timed(REPS)
                if t_now >= t_prev * 0.97:
                    break
                t_prev = t_now
            slopes = []
            for _ in range(5):
                t_small = timed(REPS)
                t_big = timed(4 * REPS)
                slopes.append((t_big - t_small) / (3 * REPS))
            t_dev = sorted(slopes)[2]
            # the tunnel chip's clock can RAMP mid-measurement and turn
            # a slope negative/absurd; re-run the whole phase until the
            # estimate is sane (positive and not faster than 1 us)
            if t_dev > 1e-6:
                break
        if t_dev is None or t_dev <= 1e-6:
            t_dev = max(t_dev or 0.0, 1e-6)
            print(f"{name}: WARNING unstable clock; device time floored",
                  file=sys.stderr)

        t_total = t_prep + t_dev
        total_bytes += n_out
        agg_total_t += t_total
        t_ref_total += n_out / (REF_MIBS[name] * 1024 * 1024)
        per_vec.append(dict(
            name=name, n_out=n_out, t_prep_ms=t_prep * 1e3,
            t_dev_ms=t_dev * 1e3, gbps=n_out / t_total / 1e9,
            gbps_dev=n_out / t_dev / 1e9,
            shipped_mb=shipped / 1e6,
        ))
        print(
            f"{name}: {n_out} B  prep {t_prep*1e3:.2f} ms + device "
            f"{t_dev*1e3:.2f} ms -> {n_out/t_total/1e9:.3f} GB/s "
            f"(device-only {n_out/t_dev/1e9:.2f}; ships "
            f"{shipped/1e6:.1f} MB/request)",
            file=sys.stderr,
        )

    gbps = total_bytes / agg_total_t / 1e9
    ref_gbps = total_bytes / t_ref_total / 1e9
    datas = [(VECTOR_DIR / f"{n}.lz4").read_bytes() for n in VECTORS]
    sustained_host, sustained_e2e = bench_sustained(datas, sync_probe)
    print(
        json.dumps(
            {
                "metric": "lz4_decode_post_scan_z9m_t1111k_b3444k",
                "value": round(gbps, 4),
                "unit": "GB/s/chip",
                "vs_baseline": round(gbps / ref_gbps, 4),
                "sustained_hostbound_gbps": round(sustained_host, 4),
                "sustained_hostbound_vs_baseline": round(
                    sustained_host / ref_gbps, 4),
                "sustained_tunnel_e2e_gbps": round(sustained_e2e, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    wait_for_backend()
    try:
        sys.exit(main())
    except RuntimeError as e:
        # Backend died mid-run (tunnel outage): JAX's backend state is
        # poisoned in-process, so re-exec for a clean retry.
        attempt = int(os.environ.get("LZ4TPU_BENCH_ATTEMPT", "0"))
        if "UNAVAILABLE" not in str(e) or attempt >= 2:
            raise
        print(f"backend lost mid-run ({e!r}); re-exec attempt "
              f"{attempt + 1}", file=sys.stderr)
        os.environ["LZ4TPU_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
