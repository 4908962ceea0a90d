"""Benchmark collector metric formulas (reference performance.rs) + suite."""

import json
import os
import subprocess
import sys

from compute_renderer_tpu.bench.collector import PerformanceCollector

BENCH_PY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench.py")


def collector_with_times(times, n_tris=1000, n_pix=10000):
    c = PerformanceCollector("test", 0, benchmark_duration_secs=None,
                            num_triangles=n_tris, num_pixels=n_pix)
    c.frame_times = list(times)
    return c


def test_avg_fps_is_reciprocal_mean():
    c = collector_with_times([0.01, 0.02, 0.03])
    d = c.calculate_metrics()
    assert abs(d.avg_fps - 1.0 / 0.02) < 1e-9
    assert abs(d.ms_per_frame - 20.0) < 1e-9


def test_percentile_tails():
    # 100 frames: 99 at 10ms, 1 at 100ms.
    times = [0.01] * 99 + [0.1]
    c = collector_with_times(times)
    d = c.calculate_metrics()
    # slowest 5% = ceil(5) = 5 frames: 4x10ms + 1x100ms -> mean 28ms
    assert abs(d.min_fps - 1.0 / 0.028) < 1e-6
    assert abs(d.fps_5_percent_low - 1.0 / 0.028) < 1e-6
    # slowest 1% = 1 frame = 100ms
    assert abs(d.fps_1_percent_low - 10.0) < 1e-9
    # fastest 5% = five 10ms frames
    assert abs(d.max_fps - 100.0) < 1e-9


def test_throughput_metrics():
    c = collector_with_times([0.001], n_tris=1_000_000, n_pix=786_432)
    d = c.calculate_metrics()
    assert abs(d.mtri_per_s - 1000.0) < 1e-6
    assert abs(d.mpix_per_s - 786.432) < 1e-6


def test_empty_metrics_zero():
    c = collector_with_times([])
    d = c.calculate_metrics()
    assert d.avg_fps == 0.0


def test_warmup_excluded():
    c = PerformanceCollector("w", 0, benchmark_duration_secs=0.05,
                            warmup_secs=10.0)
    c.update()  # start
    done = c.update()
    assert not done
    assert c.frame_times == []  # inside warm-up window


def test_duration_termination():
    c = PerformanceCollector("d", 0, benchmark_duration_secs=0.0,
                            warmup_secs=0.0)
    c.update()
    import time

    time.sleep(0.01)
    assert c.update() is True


def test_json_output():
    c = collector_with_times([0.01])
    data = json.loads(c.calculate_metrics().to_json())
    assert data["frames"] == 1
    assert "ms_per_frame" in data


def test_suite_configs_match_reference():
    from compute_renderer_tpu.bench.suite import benchmark_scene_configs

    scenes = benchmark_scene_configs(30.0)
    # Reference's 8 rows (main.rs:150-232) + 4 extension rows (the round-1
    # small stand-ins, kept for continuity) + the structured real-loader
    # row (a synthesized multi-submesh OBJ loaded from disk, VERDICT r2 #7)
    # + its material-extension twin (same geometry, MTL resolved) + the
    # textured small structured scene (map_Kd atlas end-to-end) + the
    # textured MEGA row (same ~1M-tri scene, micro-path deferred
    # texturing) + the quality-stack row (bilinear + 2x SSAA on the
    # textured small scene) + 4 hardware-pipeline rows (wgpu-faithful on
    # the reference scenes — the reference's custom-vs-hardware A/B,
    # main.rs:150-232, VERDICT r4 #6).
    assert len(scenes) == 21
    # Order: San Miguel, Exterior, Suzanne, Vokselia x (tpu, xla)
    assert "San_Miguel" in scenes[0].model_path
    assert scenes[0].normalized_backend() == "tpu"
    assert scenes[1].normalized_backend() == "xla"
    assert scenes[4].model_path == "suzanne.obj"
    assert scenes[4].camera_config.position == (0.0, 0.0, 3.0)
    assert scenes[6].camera_config.position[1] == 0.86896104
    # wgpu-faithful rows: one per reference scene, same camera spawns.
    faithful = scenes[12:16]
    assert [s.normalized_backend() for s in faithful] == \
        ["wgpu-faithful"] * 4
    assert "San_Miguel" in faithful[0].model_path
    assert faithful[2].model_path == "suzanne.obj"
    assert faithful[0].camera_config.position == \
        scenes[0].camera_config.position
    assert scenes[16].model_path == "structured_scene.obj"
    assert scenes[16].normalized_backend() == "tpu"
    assert scenes[17].model_path == "structured_scene.obj"
    assert scenes[17].enable_materials and not scenes[16].enable_materials
    assert scenes[16].scene_name() != scenes[17].scene_name()
    assert scenes[18].model_path == "structured_scene_tex.obj"
    assert scenes[18].enable_textures
    assert "+textures" in scenes[18].scene_name()
    assert scenes[19].model_path == "structured_scene.obj"
    assert scenes[19].enable_textures
    assert scenes[19].scene_name() not in (
        scenes[16].scene_name(), scenes[17].scene_name(),
        scenes[18].scene_name(),
    )
    assert scenes[20].model_path == "structured_scene_tex.obj"
    assert scenes[20].texture_filter == "bilinear" and scenes[20].ssaa == 2
    assert "+bilinear" in scenes[20].scene_name()
    assert "+ssaa2" in scenes[20].scene_name()
    assert scenes[20].scene_name() != scenes[18].scene_name()
    # Enumerating configs is side-effect-free: the 80 MB structured asset
    # is synthesized lazily by run_scene, not here (tests/test_objgen.py
    # covers the synthesis + caching contract).


def test_run_scene_smoke():
    from compute_renderer_tpu.bench.suite import benchmark_scene_configs, run_scene

    cfg = benchmark_scene_configs(0.0)[5]  # Suzanne on the xla baseline
    result = run_scene(cfg, 64, 48, scene_index=5, warmup_secs=0.0,
                       max_frames=3)
    assert result["frames"] >= 1
    assert result["ms_per_frame"] > 0
    assert result["backend"] == "xla"


def test_update_batch_records_frames():
    c = PerformanceCollector("b", 0, benchmark_duration_secs=None,
                            warmup_secs=0.0)
    c.update_batch(4, 0.2)  # first call primes start
    import time

    time.sleep(0.01)
    c.update_batch(4, 0.2)
    assert len(c.frame_times) == 4
    assert abs(c.frame_times[0] - 0.05) < 1e-9
    d = c.calculate_metrics()
    assert abs(d.avg_fps - 20.0) < 1e-6


def test_sysmon_fallback_and_native():
    from compute_renderer_tpu.bench import sysmon

    rss = sysmon.process_rss_bytes()
    assert rss > 10 * 2**20  # a live Python+JAX process
    sysmon.global_cpu_percent()
    pct = sysmon.global_cpu_percent()
    assert 0.0 <= pct <= 100.0
    # Pure-Python path agrees in shape.
    assert 0.0 <= sysmon._py_cpu_percent() <= 100.0


def test_run_scene_batched_smoke():
    from compute_renderer_tpu.bench.suite import benchmark_scene_configs, run_scene

    cfg = benchmark_scene_configs(0.0)[4]  # Suzanne on the tpu backend
    result = run_scene(cfg, 64, 48, scene_index=4, warmup_secs=0.0,
                       max_frames=4, batch=2)
    assert result["frames"] >= 2
    assert result["ms_per_frame"] > 0


def test_measure_dispatch_overhead():
    from compute_renderer_tpu.bench.suite import measure_dispatch_overhead_ms

    ms = measure_dispatch_overhead_ms(samples=3)
    assert 0.0 < ms < 10_000.0


def _run_bench(tmp_path, failures, **env_extra):
    """Run bench.py's supervisor with the _BENCH_FAKE hook: the child fails
    ``failures`` times (counting down a file), then emits a fake JSON line."""
    fail_file = tmp_path / "failures.txt"
    fail_file.write_text(str(failures))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update({"_BENCH_FAKE": str(fail_file), "BENCH_BACKOFF_S": "0.01",
                "BENCH_CHILD_TIMEOUT_S": "60"})
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH_PY], env=env,
                          capture_output=True, text=True, timeout=120)


def test_bench_supervisor_retries_then_succeeds(tmp_path):
    proc = _run_bench(tmp_path, failures=2, BENCH_ATTEMPTS="3")
    assert proc.returncode == 0, proc.stderr
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["metric"] == "fake"
    assert proc.stderr.count("failed; retrying") == 2


def test_bench_supervisor_cpu_fallback_labeled(tmp_path):
    # All TPU attempts fail -> the CPU-fallback child runs (countdown file
    # is exhausted by then) and its line is loudly labeled.
    proc = _run_bench(tmp_path, failures=2, BENCH_ATTEMPTS="2")
    assert proc.returncode == 0, proc.stderr
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "CPU FALLBACK" in line["metric"]
    assert "CPU FALLBACK" in proc.stderr


def test_bench_supervisor_fallback_disabled(tmp_path):
    proc = _run_bench(tmp_path, failures=3, BENCH_ATTEMPTS="2",
                      BENCH_CPU_FALLBACK="0")
    assert proc.returncode == 1
    assert "all 2 attempts failed" in proc.stderr


def test_suite_batches_tpu_rows_only():
    # The one-methodology rule: batched dispatch for sub-ms tpu frames,
    # batch 1 for the seconds-long xla baseline rows (overhead there <1%).
    from compute_renderer_tpu.bench.suite import run_suite

    rows = run_suite(width=64, height=48, offset=4, duration_secs=0.05,
                     max_frames=2, batch=4, limit=2)
    by_backend = {r["backend"]: r for r in rows[:2]}
    assert by_backend["tpu"]["batch"] == 4
    assert by_backend["xla"]["batch"] == 1
    for r in rows[:2]:
        assert "dispatch_overhead_ms" in r


def test_run_scene_faithful_smoke():
    # The hardware-pipeline suite rows (reference custom-vs-wgpu A/B,
    # main.rs:150-232): wgpu-faithful renders through run_scene at batch 1
    # (the reference's wgpu path fences per frame, renderer.rs:383-393).
    from compute_renderer_tpu.bench.suite import (
        benchmark_scene_configs, run_scene,
    )

    cfg = benchmark_scene_configs(0.0)[14]  # Suzanne, wgpu-faithful
    assert cfg.normalized_backend() == "wgpu-faithful"
    result = run_scene(cfg, 64, 48, scene_index=14, warmup_secs=0.0,
                       max_frames=2)
    assert result["frames"] >= 1
    assert result["ms_per_frame"] > 0
    assert result["backend"] == "wgpu-faithful"
