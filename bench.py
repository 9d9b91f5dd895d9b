"""Benchmark: 640×640 DBNet inference throughput on the local accelerator.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``

Baseline: the BASELINE.json north-star target of ≥1000 images/sec on a
v5e-8 slice = 125 images/sec/chip; ``vs_baseline`` is measured
images/sec/chip divided by 125. (The reference publishes no throughput
numbers at all — SURVEY.md §6.)

Method: N eval-mode forwards chained inside one jit via ``lax.scan`` (each
iteration reads a perturbed input so nothing folds away), timed around a
single device call — this measures device throughput without the per-call
RPC latency of the tunneled TPU runtime, whose ``block_until_ready`` is
fire-and-forget. The reported number is the MEDIAN of ``repeats`` timed
scans (after one warm-up/compile scan), so one slow RPC cannot skew it.
"""

import json
import os
import threading
import subprocess
import sys
import time
from functools import partial

import jax

# The axon TPU plugin wins platform selection over the JAX_PLATFORMS env var
# (CLAUDE.md gotcha) — apply the override through the config API before any
# backend init so `JAX_PLATFORMS=cpu python bench.py` really runs on CPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

BASELINE_IMAGES_PER_SEC_PER_CHIP = 125.0

# Last successful result, updated on every clean run. When the tunnel is out
# or the chip is held by a detached chain past the wait budget, the bench
# emits this (annotated) instead of a zeroed line — an honest degraded record
# beats rc=124/nothing (round-3 lesson: the driver recorded NO number because
# the old 2400s+1500s wait budget exceeded the driver's own timeout).
_LASTGOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_LASTGOOD.json")

# Combined budget for BOTH waits (workload serialization + tunnel liveness).
# Must stay well under the driver's bench timeout; see VERDICT r3 ask #1.
_WAIT_BUDGET_S = float(os.environ.get("BENCH_WAIT_BUDGET_S", "480"))
# Absolute watchdog on the whole process: if measurement itself wedges (e.g.
# a mid-flight tunnel outage hangs a device call forever), emit the degraded
# line and exit 0 instead of being killed with no output.
_HARD_DEADLINE_S = float(os.environ.get("BENCH_HARD_DEADLINE_S", "1320"))

# Sentinel the bench raises the moment it starts waiting for the chip. The
# detached evidence chains poll it before launching every TPU step and
# between liveness probes, and YIELD (stop launching steps) while it exists —
# so the driver's bench can preempt a chain instead of waiting out its
# longest step (VERDICT r4 ask #2). Removed when the bench exits; chains
# treat a sentinel older than 1 h as stale (a crashed bench must not wedge
# future chains).
_WANTS_CHIP_PATH = "/tmp/BENCH_WANTS_CHIP"

_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit(payload: dict) -> None:
    # First writer wins: the success path and the watchdog thread can race
    # near the hard deadline; without this interlock both could print,
    # violating the one-JSON-line contract (ADVICE r4).
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(payload))
        sys.stdout.flush()


def _raise_wants_chip() -> None:
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return  # CPU run needs no chip; don't pause the chains
    try:
        with open(_WANTS_CHIP_PATH, "w") as f:
            json.dump({"pid": os.getpid(), "ts": time.time()}, f)
    except OSError:
        pass


def _clear_wants_chip() -> None:
    try:
        os.unlink(_WANTS_CHIP_PATH)
    except OSError:
        pass


def _degraded_line(note: str) -> dict:
    line = {
        "metric": "db_resnet18_inference_640",
        "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
        "degraded": note,
    }
    try:
        with open(_LASTGOOD_PATH) as f:
            good = json.load(f)
        line.update({k: good[k] for k in
                     ("value", "vs_baseline", "production_int8_prob_only",
                      "production_vs_baseline") if k in good})
        line["last_known_good_from"] = good.get("recorded_at", "unknown")
    except (OSError, ValueError):
        pass
    return line


def _arm_watchdog() -> None:
    # A daemon TIMER THREAD, not signal.alarm: Python signal handlers only run
    # on the main thread between bytecodes, and the hang this guards against
    # is precisely the main thread stuck inside a single device call / compile
    # for minutes — SIGALRM would be queued but the handler never entered.
    # XLA releases the GIL during those calls, so a thread does fire.
    def on_deadline():
        _emit(_degraded_line(
            f"hard deadline {_HARD_DEADLINE_S:.0f}s expired mid-measurement "
            "(tunnel hang?); reporting last known good"))
        _clear_wants_chip()
        os._exit(0)

    t = threading.Timer(_HARD_DEADLINE_S, on_deadline)
    t.daemon = True
    t.start()

# Command-line markers of this repo's own TPU workloads (detached quality /
# training chains). Two processes sharing the tunneled chip can silently
# corrupt results (docs/PERFORMANCE.md), so the bench waits for them.
_TPU_WORKLOAD_MARKERS = ("quality_bench", "cli.train", "train_rec",
                         "rec_bench", "diag_inproc", "tpu_gate",
                         "e2e_probe", "pretrain_backbone", "_probe_run",
                         "cli.prune", "cli.ocr", "cli.make_eval")

# Cmdline markers of workloads KNOWN to honor a JAX_PLATFORMS=cpu env pin:
# `import db_text_minimal_tpu` applies the env var via jax.config before
# backend init. Bare scripts that import jax directly silently land on the
# TPU regardless of the env var (CLAUDE.md), so the CPU-pin skip below must
# only trust cmdlines in this list (ADVICE r4: a pinned-looking workload
# that doesn't import the package would hold the tunnel invisibly).
_HONORS_CPU_PIN_MARKERS = ("-m db_text_minimal_tpu.", "diag_inproc",
                           "bench.py")


def _ancestor_pids():
    """Own pid plus every ancestor — a bench launched as a chain step must
    not treat its own parent ``bash /tmp/chainNN.sh`` as a blocking
    workload (self-deadlock)."""
    pids, pid = set(), os.getpid()
    while pid > 1 and pid not in pids:
        pids.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])  # field 4: ppid
        except (OSError, ValueError, IndexError):
            break
    return pids


def _pinned_to_cpu(pid: str) -> bool:
    """A workload launched with JAX_PLATFORMS=cpu never opens the tunnel
    (the package applies the env var through jax.config before backend
    init), so it cannot corrupt a concurrent TPU measurement — e.g. the
    CPU fallback evals that run during tunnel outages."""
    try:
        with open(f"/proc/{pid}/environ", "rb") as f:
            env = f.read().decode("utf-8", "replace")
    except OSError:
        return False
    return "JAX_PLATFORMS=cpu" in env.split("\0")


def _other_tpu_pids():
    pids = []
    skip = _ancestor_pids()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) in skip:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace").replace("\0", " ")
        except OSError:
            continue
        if "pytest" in cmd:
            continue  # CPU-mesh test runs name the same modules
        if ("python" in cmd and any(m in cmd for m in _TPU_WORKLOAD_MARKERS)) \
                or ("bash" in cmd and "chain" in cmd and ".sh" in cmd):
            if _pinned_to_cpu(pid) and \
                    any(m in cmd for m in _HONORS_CPU_PIN_MARKERS):
                continue
            pids.append((int(pid), cmd.strip()))
    return pids


def wait_for_exclusive_tpu(max_wait_s: float = _WAIT_BUDGET_S) -> str:
    """Best-effort serialization + liveness gate before timing anything.

    ONE shared budget (default 480 s — well under the driver's bench
    timeout) covers both waits:

    1. Wait for this repo's own detached TPU chains to finish — concurrent
       tunnel use corrupts results, not just latency (docs/PERFORMANCE.md).
    2. Wait for the tunnel to accept backend init — it has real outage
       windows ("Unable to initialize backend 'axon'"); probing from a
       subprocess avoids poisoning this process's backend state.

    Returns "" when clear to measure, else a non-empty reason string — the
    caller must then emit the degraded (last-known-good) line rather than
    measure concurrently/against a dead backend.
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return ""  # CPU run (tests/dev): nothing to serialize against
    deadline = time.time() + max_wait_s
    while True:
        others = _other_tpu_pids()
        if not others:
            break
        if time.time() >= deadline:
            return (f"TPU workload still holding the chip after "
                    f"{max_wait_s:.0f}s: {others[0][1][:120]}")
        print(f"# bench: waiting on TPU workload {others[0]}",
              file=sys.stderr)
        time.sleep(30)
    while True:
        remaining = deadline - time.time()
        if remaining <= 0:
            return f"TPU backend unavailable for {max_wait_s:.0f}s"
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=max(60, min(300, remaining)), capture_output=True)
            if probe.returncode == 0:
                return ""
        except subprocess.TimeoutExpired:
            pass
        print("# bench: TPU backend unavailable, retrying", file=sys.stderr)
        time.sleep(min(60, max(1, deadline - time.time())))


def bench(batch_size: int, steps: int = 20, size: int = 640,
          repeats: int = 3) -> float:
    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    base = DBTextModel(dtype=dtype)
    variables = base.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, size, size, 3)), train=False)
    # weight-equivalent fused inference head (~19 % faster head on TPU,
    # verified equal in tests/test_models.py)
    variables = fuse_variables(variables)
    model = DBTextModel(dtype=dtype, head_name="FusedDBHead")

    @partial(jax.jit, static_argnums=(2,))
    def forward_n(v, x, n):
        def body(carry, _):
            out = model.apply(v, x + carry, train=False)
            return out.mean().astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    x = jnp.asarray(np.random.RandomState(0)
                    .rand(batch_size, size, size, 3).astype(np.float32))
    float(forward_n(variables, x, steps))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forward_n(variables, x, steps))  # forces completion (D2H)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median
    return batch_size * steps / dt


def bench_production(batch_size: int, steps: int = 20, size: int = 640,
                     repeats: int = 3) -> float:
    """Production serving forward: int8 PTQ, prob-only (the serving
    handler's fastest configuration — what ``--infer_mode int8`` +
    ``mode=boxes`` runs). Same chained-scan timing as ``bench``."""
    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables
    from db_text_minimal_tpu.models.quant_infer import (
        calibrate_activation_scales, prepare_quant_params,
        quant_dbnet_forward)

    base = DBTextModel(dtype=jnp.bfloat16)
    variables = base.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, size, size, 3)), train=False)
    rng = np.random.RandomState(0)
    x = rng.rand(batch_size, size, size, 3).astype(np.float32) * 255 - 120
    qv = prepare_quant_params(fuse_variables(variables), skip=())
    qv = jax.device_put(calibrate_activation_scales(qv, [x[:2]]))

    @partial(jax.jit, static_argnums=(2,))
    def forward_n(v, x, n):
        def body(carry, _):
            out = quant_dbnet_forward(v, x + carry, prob_only=True)
            return out.mean().astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    xd = jnp.asarray(x)
    float(forward_n(qv, xd, steps))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forward_n(qv, xd, steps))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return batch_size * steps / dt


def main():
    _arm_watchdog()
    _raise_wants_chip()  # tell detached chains to yield the chip
    try:
        _main_measure()
    finally:
        _clear_wants_chip()


def _main_measure():
    blocked = wait_for_exclusive_tpu()
    if blocked:
        # Do NOT measure concurrently with another tunnel workload (silent
        # corruption) or against a dead backend — emit the honest degraded
        # line with the last known good numbers annotated.
        _emit(_degraded_line(blocked))
        return
    try:
        n_chips = jax.device_count()
    except Exception as e:
        _emit(_degraded_line(f"TPU backend init failed: {type(e).__name__}"))
        return
    best = 0.0
    # batch 32 is the measured sweet spot (64 is slightly slower; see
    # docs/PERFORMANCE.md) — one batch size keeps the bench to one compile
    batches = (32,) if jax.default_backend() != "cpu" else (4,)
    for bs in batches:
        try:
            best = max(best, bench(batch_size=bs))
        except Exception:
            break
    per_chip = best / max(n_chips, 1)
    # production serving mode (int8 prob-only) in the same JSON line so the
    # driver records both parity and production numbers (VERDICT r2 #9)
    prod_per_chip = 0.0
    try:
        prod_per_chip = bench_production(batch_size=batches[0]) \
            / max(n_chips, 1)
    except Exception:
        pass
    line = {
        "metric": "db_resnet18_inference_640",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMAGES_PER_SEC_PER_CHIP, 4),
        "production_int8_prob_only": round(prod_per_chip, 2),
        "production_vs_baseline": round(
            prod_per_chip / BASELINE_IMAGES_PER_SEC_PER_CHIP, 4),
    }
    if per_chip > 0 and jax.default_backend() != "cpu":
        try:
            with open(_LASTGOOD_PATH, "w") as f:
                json.dump({**line, "recorded_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%S")}, f)
        except OSError:
            pass
    _emit(line)


if __name__ == "__main__":
    main()
