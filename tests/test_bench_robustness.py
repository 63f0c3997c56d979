"""bench.py must land exactly one driver-parseable JSON line no matter
what the tunnel does (round-3 verdict #1: BENCH_r03.json was rc=124
with no line at all).

These tests drive the REAL supervisor process against a fake child
(LZ4TPU_BENCH_FAKE=1 — synthetic vector events through the same
event-sourcing plumbing) to prove the four failure paths:

  1. happy path: child completes -> complete payload, cache written;
  2. deadline: child hangs mid-run -> partial payload from whatever
     vectors finished, incomplete=true;
  3. external SIGTERM (the driver's `timeout` sends this first) ->
     partial payload, rc 0;
  4. total outage (no vector finishes) -> labeled stale-cache payload,
     or a zero-value line when no cache exists.

The payload-math unit tests at the bottom pin vs_target/vs_baseline.
"""

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

BENCH = pathlib.Path(__file__).resolve().parent.parent / "bench.py"


def _run(env_extra, timeout=60, sigterm_after_mark=None):
    env = dict(os.environ)
    env["LZ4TPU_BENCH_FAKE"] = "1"
    env.update(env_extra)
    proc = subprocess.Popen(
        [sys.executable, str(BENCH)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
    )
    if sigterm_after_mark is not None:
        # wait until the fake child has recorded the named vector
        # (fixed sleeps race child startup on a loaded 1-core box)
        mark = pathlib.Path(env["LZ4TPU_BENCH_FAKE_MARK"])
        deadline = time.time() + 30
        while time.time() < deadline:
            if mark.exists() and sigterm_after_mark in \
                    mark.read_text().split():
                break
            time.sleep(0.05)
        else:
            proc.kill()
            raise AssertionError(
                f"fake child never marked {sigterm_after_mark!r}")
        proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=timeout)
    return proc.returncode, out.decode(), err.decode()


def _one_json_line(out: str) -> dict:
    lines = [l for l in out.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line: {out!r}"
    return json.loads(lines[0])


def test_happy_path_complete_payload(tmp_path):
    cache = tmp_path / "cache.json"
    rc, out, _err = _run({"LZ4TPU_BENCH_CACHE": str(cache)})
    assert rc == 0
    payload = _one_json_line(out)
    assert payload["metric"] == "lz4_decode_post_scan_z9m_t1111k_b3444k"
    assert payload["value"] > 0
    assert "incomplete" not in payload
    assert "vs_target" in payload and "vs_baseline" in payload
    # a complete run refreshes the fallback cache
    cached = json.loads(cache.read_text())
    assert cached["value"] == payload["value"]
    assert "cached_at" in cached


def test_deadline_hang_emits_partial(tmp_path):
    # child emits z9m + t1111k then hangs; 6s deadline kills it
    rc, out, err = _run({
        "LZ4TPU_BENCH_CACHE": str(tmp_path / "cache.json"),
        "LZ4TPU_BENCH_FAKE_HANG_AFTER": "t1111k",
        "LZ4TPU_BENCH_DEADLINE": "6",
    }, timeout=40)
    assert rc == 0
    payload = _one_json_line(out)
    assert payload["incomplete"] is True
    assert payload["vectors_measured"] == ["z9m", "t1111k"]
    assert payload["value"] > 0          # aggregated over the two done
    assert "deadline" in payload["note"]
    assert "deadline" in err


def test_sigterm_emits_partial(tmp_path):
    rc, out, _err = _run({
        "LZ4TPU_BENCH_CACHE": str(tmp_path / "cache.json"),
        "LZ4TPU_BENCH_FAKE_HANG_AFTER": "z9m",
        "LZ4TPU_BENCH_FAKE_MARK": str(tmp_path / "mark.txt"),
        "LZ4TPU_BENCH_DEADLINE": "120",
    }, sigterm_after_mark="z9m", timeout=60)
    assert rc == 0
    payload = _one_json_line(out)
    assert payload["incomplete"] is True
    assert payload["vectors_measured"] == ["z9m"]
    assert "signal 15" in payload["note"]


def test_total_outage_stale_cache(tmp_path):
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({
        "metric": "lz4_decode_post_scan_z9m_t1111k_b3444k",
        "value": 2.5, "unit": "GB/s/chip", "vs_baseline": 1.5,
        "vs_target": 0.83, "cached_at": "2026-08-18T00:00:00",
    }))
    # hang before ANY vector completes
    rc, out, _err = _run({
        "LZ4TPU_BENCH_CACHE": str(cache),
        "LZ4TPU_BENCH_FAKE_DELAY": "3600",
        "LZ4TPU_BENCH_DEADLINE": "5",
    }, timeout=40)
    assert rc == 0
    payload = _one_json_line(out)
    assert payload["value"] == 2.5
    assert payload["stale_cache"] is True
    assert payload["measured_this_run"] is False
    assert payload["incomplete"] is True


def test_total_outage_no_cache(tmp_path):
    rc, out, _err = _run({
        "LZ4TPU_BENCH_CACHE": str(tmp_path / "absent.json"),
        "LZ4TPU_BENCH_FAKE_DELAY": "3600",
        "LZ4TPU_BENCH_DEADLINE": "5",
    }, timeout=40)
    assert rc == 0
    payload = _one_json_line(out)
    assert payload["value"] == 0.0
    assert payload["incomplete"] is True
    assert payload["measured_this_run"] is False


# ---------------------------------------------------------------------------
# payload math
# ---------------------------------------------------------------------------

def test_compose_payload_math():
    sys.path.insert(0, str(BENCH.parent))
    import bench

    vectors = [
        dict(name="z9m", n_out=9_437_166, t_prep_ms=0.5, t_dev_ms=0.1),
        dict(name="t1111k", n_out=1_111_000, t_prep_ms=2.0,
             t_dev_ms=1.0),
    ]
    p = bench.compose_payload(vectors)
    total = 9_437_166 + 1_111_000
    agg_t = (0.6 + 3.0) / 1e3
    assert p["value"] == pytest.approx(total / agg_t / 1e9, rel=1e-3)
    assert p["vs_target"] == pytest.approx(p["value"] / 3.0, rel=1e-3)
    t_ref = (9_437_166 / (2094.0 * 1024 * 1024)
             + 1_111_000 / (1099.0 * 1024 * 1024))
    ref_gbps = total / t_ref / 1e9
    assert p["vs_baseline"] == pytest.approx(p["value"] / ref_gbps,
                                             rel=1e-3)


def test_compose_payload_drops_floored_vectors():
    """A device slope floored under an unstable clock must not ride
    the aggregate denominator (round-4 verdict weak-#3): the vector is
    flagged, listed in vectors_excluded, and the aggregate equals the
    clean subset's."""
    sys.path.insert(0, str(BENCH.parent))
    import bench

    clean = [
        dict(name="z9m", n_out=9_437_166, t_prep_ms=0.5, t_dev_ms=0.1),
        dict(name="t1111k", n_out=1_111_000, t_prep_ms=2.0,
             t_dev_ms=1.0),
    ]
    floored = dict(name="b3444k", n_out=3_444_000, t_prep_ms=0.3,
                   t_dev_ms=0.001, floored=True)
    p_all = bench.compose_payload(clean + [floored])
    p_clean = bench.compose_payload(clean)
    assert p_all["value"] == p_clean["value"]
    assert p_all["vs_baseline"] == p_clean["vs_baseline"]
    assert p_all["vectors_excluded"] == ["b3444k"]
    rows = {r["name"]: r for r in p_all["per_vector"]}
    assert rows["b3444k"]["floored"] is True
    assert "vectors_excluded" not in p_clean


def test_compose_payload_per_vector_rows():
    """Per-vector rates and vs_target ride the payload so the named
    vectors cannot hide inside the aggregate; spread fields pass
    through when present."""
    sys.path.insert(0, str(BENCH.parent))
    import bench

    vectors = [
        dict(name="t1111k", n_out=1_111_000, t_prep_ms=2.0,
             t_dev_ms=1.0, t_dev_ms_min=0.9, t_dev_ms_max=1.2,
             slope_rounds=5),
    ]
    p = bench.compose_payload(vectors)
    (row,) = p["per_vector"]
    assert row["name"] == "t1111k"
    assert row["gbps"] == pytest.approx(1_111_000 / 3e-3 / 1e9,
                                        rel=1e-3)
    assert row["vs_target"] == pytest.approx(row["gbps"] / 3.0,
                                             rel=1e-3)
    assert row["t_dev_ms_min"] == 0.9 and row["t_dev_ms_max"] == 1.2
    assert row["slope_rounds"] == 5


def test_partial_payload_dedups_reexec_duplicates():
    sys.path.insert(0, str(BENCH.parent))
    import bench

    events = [
        dict(event="vector", name="z9m", n_out=9_437_166, t_prep_ms=1.0,
             t_dev_ms=1.0),
        dict(event="vector", name="z9m", n_out=9_437_166, t_prep_ms=2.0,
             t_dev_ms=2.0),   # re-exec re-measured: keep the LAST
    ]
    p = bench._partial_payload(events, "test")
    assert p["value"] == pytest.approx(9_437_166 / 4e-3 / 1e9, rel=1e-3)
    assert p["vectors_measured"] == ["z9m"]
