"""bench.py guard rails: workload detection must not self-deadlock
(ancestor exclusion), must ignore CPU pytest runs, and the wait must be a
no-op on CPU (tests run with JAX_PLATFORMS=cpu via conftest)."""

import importlib.util
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ancestor_pids_walks_to_init():
    b = _load_bench()
    anc = b._ancestor_pids()
    assert os.getpid() in anc
    assert os.getppid() in anc or os.getppid() <= 1


def test_other_tpu_pids_ignores_pytest_and_ancestors():
    b = _load_bench()
    # this very process is a pytest run whose cmdline could name test files
    # containing workload markers; it must never be reported
    assert all(pid != os.getpid() for pid, _ in b._other_tpu_pids())
    # a live non-ancestor workload IS reported (pytest's own env pins
    # JAX_PLATFORMS=cpu via conftest — drop it so the child counts as a
    # tunnel workload)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import time; time.sleep(30)", "--tag", "cli.quality_bench"],
        start_new_session=True, env=env)
    try:
        time.sleep(0.3)
        found = [pid for pid, _ in b._other_tpu_pids() if pid == proc.pid]
        assert found, "detached workload with a marker cmdline not detected"
    finally:
        proc.kill()
        proc.wait()


def test_other_tpu_pids_skips_cpu_pinned_workloads():
    # A workload launched with JAX_PLATFORMS=cpu never opens the tunnel, so
    # it must not block the bench (e.g. CPU fallback evals during outages) —
    # but ONLY cmdlines known to honor the pin (the package applies it via
    # jax.config; bare scripts importing jax directly ignore the env var and
    # still land on the TPU — ADVICE r4).
    b = _load_bench()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    trusted = subprocess.Popen(
        [sys.executable, "-c",
         "import time; time.sleep(30)", "--tag",
         "-m db_text_minimal_tpu.cli.quality_bench"],
        start_new_session=True, env=env)
    untrusted = subprocess.Popen(
        [sys.executable, "-c",
         "import time; time.sleep(30)", "--tag", "cli.quality_bench"],
        start_new_session=True, env=env)
    try:
        time.sleep(0.3)
        assert b._pinned_to_cpu(str(trusted.pid))
        pids = [pid for pid, _ in b._other_tpu_pids()]
        assert trusted.pid not in pids, \
            "CPU-pinned package workload wrongly blocks the bench"
        assert untrusted.pid in pids, \
            "pinned-looking bare script must still block (may ignore pin)"
    finally:
        trusted.kill()
        untrusted.kill()
        trusted.wait()
        untrusted.wait()


def test_wants_chip_sentinel_lifecycle(monkeypatch, tmp_path):
    # The sentinel is raised on a TPU run (so chains yield), cleared on
    # exit, and never raised for CPU runs.
    b = _load_bench()
    sentinel = tmp_path / "BENCH_WANTS_CHIP"
    monkeypatch.setattr(b, "_WANTS_CHIP_PATH", str(sentinel))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    b._raise_wants_chip()
    assert not sentinel.exists()
    monkeypatch.delenv("JAX_PLATFORMS")
    b._raise_wants_chip()
    assert sentinel.exists()
    b._clear_wants_chip()
    assert not sentinel.exists()
    b._clear_wants_chip()  # idempotent


def test_emit_is_once_only(capsys):
    # ADVICE r4: success emit and watchdog emit can race near the deadline;
    # first writer wins, exactly one JSON line ever prints.
    b = _load_bench()
    b._emit({"a": 1})
    b._emit({"b": 2})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and '"a"' in out[0]


def test_wait_is_noop_on_cpu():
    b = _load_bench()
    t0 = time.time()
    assert b.wait_for_exclusive_tpu() == ""
    assert time.time() - t0 < 1.0


def test_wait_budget_is_capped_under_driver_timeout():
    # Round-3 regression: a 3900s wait budget outlived the driver's bench
    # timeout, so the driver recorded rc=124 and NO number. The combined
    # budget must stay well under it (VERDICT r3 ask #1).
    b = _load_bench()
    assert b._WAIT_BUDGET_S <= 480
    assert b._HARD_DEADLINE_S <= 1500


def test_degraded_line_annotates_last_known_good(tmp_path, monkeypatch):
    b = _load_bench()
    import json
    good = {"metric": "db_resnet18_inference_640", "value": 761.8,
            "vs_baseline": 6.09, "production_int8_prob_only": 963.0,
            "production_vs_baseline": 7.7,
            "recorded_at": "2026-08-17T00:00:00"}
    p = tmp_path / "lastgood.json"
    p.write_text(json.dumps(good))
    monkeypatch.setattr(b, "_LASTGOOD_PATH", str(p))
    line = b._degraded_line("tunnel outage")
    assert line["degraded"] == "tunnel outage"
    assert line["value"] == 761.8
    assert line["production_int8_prob_only"] == 963.0
    assert line["last_known_good_from"] == "2026-08-17T00:00:00"
    # without a cache file the line is honestly zeroed
    monkeypatch.setattr(b, "_LASTGOOD_PATH", str(tmp_path / "missing.json"))
    line = b._degraded_line("tunnel outage")
    assert line["value"] == 0.0 and "last_known_good_from" not in line


def test_wait_reports_busy_chip_instead_of_blocking(monkeypatch):
    # A workload that outlives the budget must yield a reason string (the
    # caller emits the degraded line) rather than measuring concurrently.
    b = _load_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "")
    monkeypatch.setattr(
        b, "_other_tpu_pids", lambda: [(99999, "python cli.quality_bench")])
    reason = b.wait_for_exclusive_tpu(max_wait_s=0.0)
    assert "holding the chip" in reason
