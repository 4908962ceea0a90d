#!/usr/bin/env python
"""Driver benchmark: ms/frame for the north-star config (BASELINE.md) —
1024x768 Suzanne-class scene with the reference default lights on the TPU
(Pallas) backend.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the 1 ms/frame north-star target
(BASELINE.json: the reference publishes no numbers of its own), as
target_ms / measured_ms — >= 1.0 means the target is met or beaten.

Robustness (round-3 hardening): the TPU tunnel this box uses can fail two
ways — a PJRT init error raised at the first device op, and a HANG inside
``import jax`` (the axon sitecustomize registers the plugin at interpreter
startup; observed blocking forever when the relay is down). In-process
retry can't recover from a hung import, so the entry process supervises a
CHILD subprocess with a hard timeout and exponential backoff; only the
child imports jax. If every TPU attempt fails, one final child measures on
CPU (axon plugin unregistered so the import can't hang) with the metric
loudly labeled as a fallback — an honest artifact instead of an empty one.

Methodology (round-3): the headline number is the BATCH-SIZE SLOPE
  engine ms/frame = (t(N2) - t(N1)) / (N2 - N1)
over two batch sizes in one dispatch each. Per-dispatch link overhead
(tunnel round trip, host work) is a fixed intercept, so the slope is
immune to it — including the overlap between link latency and device
compute that made round 2's "elapsed - RTT" subtraction over-subtract
(VERDICT r2 weak #1). Raw wall ms/frame at the large batch is reported
alongside; both are best-of-rounds minima (the chip is time-shared, so
the minimum is the honest engine number).
"""

import json
import os
import subprocess
import sys
import time

ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "4"))
# Remote-compile through the tunnel can take minutes.
CHILD_TIMEOUT_S = float(os.environ.get("BENCH_CHILD_TIMEOUT_S", "900"))
BACKOFF_S = float(os.environ.get("BENCH_BACKOFF_S", "20"))
# When every TPU attempt fails (relay outage — the round-2/3 failure mode),
# run one clearly-labeled CPU measurement instead of producing no artifact.
CPU_FALLBACK = os.environ.get("BENCH_CPU_FALLBACK", "1") != "0"

BATCH_SMALL = 64
BATCH_LARGE = 256
ROUNDS = 4
# Interpret-mode Pallas on CPU runs ~0.9 s/frame at the north-star config;
# keep the fallback inside one child timeout.
FALLBACK_BATCHES = (8, 16)
FALLBACK_ROUNDS = 2


def probe_tpu(timeout_s: float) -> bool:
    """Bounded child that initializes the backend AND runs one tiny
    dispatch. When the relay is down, ``import jax`` hangs forever; when
    it is up, ``jax.devices()`` returns in seconds. But the tunnel also
    has a HALF-up failure mode (observed 2026-08-19): device enumeration
    answers while data-plane dispatch hangs forever — a devices()-only
    probe calls that UP and the 900 s measurement child then eats the
    full timeout per attempt. The trailing matmul + fetch forces a real
    round trip, so both failure modes cost only PROBE_TIMEOUT_S."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; d = jax.devices(); "
             "assert d and d[0].platform != 'cpu', d; "
             "x = jnp.ones((8, 128)); "
             "assert float((x @ x.T).sum()) == 8.0 * 128 * 8"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0


PROBE_TIMEOUT_S = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "210"))


def supervise() -> int:
    """Run the measurement in a child with timeout + retry/backoff, so a
    hung tunnel bootstrap or a transient PJRT init failure doesn't zero the
    round's perf artifact (VERDICT r2 missing #1)."""
    env = dict(os.environ, _BENCH_CHILD="1")
    last_err = ""
    for attempt in range(ATTEMPTS):
        if attempt:
            delay = BACKOFF_S * (2 ** (attempt - 1))
            print(
                f"[bench] attempt {attempt} failed; retrying in {delay:.0f}s:"
                f" {last_err.strip().splitlines()[-1] if last_err.strip() else 'timeout'}",
                file=sys.stderr,
            )
            time.sleep(delay)
        if "_BENCH_FAKE" not in env and not probe_tpu(PROBE_TIMEOUT_S):
            last_err = "[bench] TPU probe failed (tunnel down?)"
            print(last_err, file=sys.stderr)
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                timeout=CHILD_TIMEOUT_S,
                text=True,
            )
        except subprocess.TimeoutExpired as e:
            last_err = (e.stderr or b"").decode() if isinstance(
                e.stderr, bytes) else (e.stderr or "")
            last_err += f"\n[bench] child timed out after {CHILD_TIMEOUT_S}s"
            continue
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0 and proc.stdout.strip():
            # Echo the child's single JSON line as our own output.
            print(proc.stdout.strip().splitlines()[-1])
            return 0
        last_err = proc.stderr or f"rc={proc.returncode}"
    print(f"[bench] all {ATTEMPTS} attempts failed", file=sys.stderr)
    if last_err:
        sys.stderr.write(last_err[-2000:] + "\n")
    if not CPU_FALLBACK:
        return 1
    # Last resort: a CPU measurement that is loudly labeled as such (metric
    # name, extra.fallback, backend field) so it can never be mistaken for
    # a TPU number — an honest artifact beats an empty one. Dropping
    # PALLAS_AXON_POOL_IPS keeps the axon PJRT plugin unregistered (its
    # registration at interpreter startup is what hangs ``import jax``
    # while the relay is down).
    print("[bench] TPU unreachable; measuring CPU FALLBACK (interpret-mode "
          "kernels, NOT comparable to the TPU target)", file=sys.stderr)
    env_cpu = dict(env, JAX_PLATFORMS="cpu", _BENCH_FALLBACK="cpu")
    env_cpu.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env_cpu,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            timeout=CHILD_TIMEOUT_S,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"[bench] CPU fallback timed out after {CHILD_TIMEOUT_S}s",
              file=sys.stderr)
        return 1
    sys.stderr.write(proc.stderr)
    if proc.returncode == 0 and proc.stdout.strip():
        print(proc.stdout.strip().splitlines()[-1])
        return 0
    return 1


def measure() -> int:
    if os.environ.get("_BENCH_FAKE"):
        # Test hook: exercise the supervisor's retry/timeout/echo logic
        # without hardware (tests/test_bench.py). Value counts down a file
        # of remaining failures, so retries can be asserted.
        fail_file = os.environ["_BENCH_FAKE"]
        try:
            with open(fail_file) as f:
                remaining = int(f.read().strip() or 0)
        except FileNotFoundError:
            remaining = 0
        if remaining > 0:
            with open(fail_file, "w") as f:
                f.write(str(remaining - 1))
            print("[bench] injected failure", file=sys.stderr)
            return 2
        fake = {"metric": "fake", "value": 0.5, "unit": "ms",
                "vs_baseline": 2.0}
        if os.environ.get("_BENCH_FALLBACK") == "cpu":
            fake["metric"] = "fake (CPU FALLBACK)"
        print(json.dumps(fake))
        return 0

    fallback = os.environ.get("_BENCH_FALLBACK") == "cpu"
    batch_small, batch_large = FALLBACK_BATCHES if fallback else (
        BATCH_SMALL, BATCH_LARGE)
    rounds = FALLBACK_ROUNDS if fallback else ROUNDS

    import jax

    try:
        from compute_renderer_tpu.cache import host_cache_dir

        jax.config.update("jax_compilation_cache_dir", host_cache_dir("cli"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import CameraConfig, Scene, SceneConfig
    from compute_renderer_tpu.core.camera import CameraMode

    import numpy as np

    width, height = 1024, 768
    config = SceneConfig(
        model_path="suzanne.obj",
        camera_config=CameraConfig(
            distance=2.0, mode=CameraMode.FIRST_PERSON, position=(0.0, 0.0, 3.0)
        ),
        backend_type="tpu",
    )
    scene = Scene.from_config(config, width, height)
    renderer = Renderer(scene.mesh, width, height, backend="tpu",
                        **scene.renderer_options())

    dt = 1.0 / 60.0

    def make_batch(n):
        # Animated per-frame uniforms: the reference's loop updates uniforms
        # every frame (scene.rs:132-188).
        return [scene.update(dt) for _ in range(n)]

    # Warm-up: compile both batch sizes + first frames. The first device op
    # is ALSO the backend-init point — retried in-process with backoff
    # before giving up to the supervisor (transient tunnel outages surface
    # here as UNAVAILABLE).
    for attempt in range(3):
        try:
            out = renderer.render_batch_device(make_batch(batch_small))
            np.asarray(out[-1, 0, 0])
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"[bench] first dispatch failed ({type(e).__name__}: {e});"
                  f" retrying in {10 * (attempt + 1)}s", file=sys.stderr)
            time.sleep(10 * (attempt + 1))
    out = renderer.render_batch_device(make_batch(batch_large))
    np.asarray(out[-1, 0, 0])

    def timed_round(n):
        batch_uniforms = make_batch(n)
        t0 = time.perf_counter()
        renderer.render_batch_device(batch_uniforms, check=False)
        renderer.fence_pending()
        return time.perf_counter() - t0

    best_small = min(timed_round(batch_small) for _ in range(rounds))
    best_large = min(timed_round(batch_large) for _ in range(rounds))
    assert not renderer.flush_overflow(), "binning overflow during bench"

    # Overlap-immune engine time: the slope over batch size. Per-dispatch
    # link overhead is the intercept and cancels; device compute per extra
    # frame cannot hide behind it.
    slope_ms = (best_large - best_small) / (batch_large - batch_small) * 1e3
    wall_ms = best_large / batch_large * 1e3
    # Guards against co-tenant noise on the time-shared chip: the engine
    # number can never exceed wall ms/frame, and a NON-POSITIVE slope
    # (interference hit the small-batch rounds harder than the large ones)
    # is not a measurement at all — fall back to the wall number rather
    # than publishing a near-zero artifact.
    slope_valid = slope_ms > 0.0
    ms_per_frame = min(slope_ms, wall_ms) if slope_valid else wall_ms

    target_ms = 1.0
    metric = "ms/frame 1024x768 suzanne-class (tpu backend, batch-slope engine time)"
    if fallback:
        metric += " [CPU FALLBACK — TPU tunnel unavailable; interpret-mode kernels]"
    result = {
        "metric": metric,
        "value": round(ms_per_frame, 4),
        "unit": "ms",
        "vs_baseline": round(target_ms / ms_per_frame, 4),
        "extra": {
            "backend": jax.default_backend(),
            "fallback": fallback,
            "methodology": "slope of best-of-%d wall time over batch sizes "
                           "%d and %d (overlap-immune; intercept = link/"
                           "dispatch overhead)" % (rounds, batch_small,
                                                   batch_large),
            "slope_valid": slope_valid,
            "wall_ms_per_frame_batch%d" % batch_large: round(wall_ms, 4),
            "wall_ms_per_frame_batch%d" % batch_small: round(
                best_small / batch_small * 1e3, 4),
            "num_triangles": scene.total_tris,
            "fps": round(1e3 / ms_per_frame, 1),
            "mtri_per_s": round(scene.total_tris / (ms_per_frame / 1e3) / 1e6, 2),
            "mpix_per_s": round(width * height / (ms_per_frame / 1e3) / 1e6, 1),
        },
    }
    print(json.dumps(result))
    return 0


def main() -> int:
    if os.environ.get("_BENCH_CHILD") == "1":
        return measure()
    return supervise()


if __name__ == "__main__":
    sys.exit(main())
