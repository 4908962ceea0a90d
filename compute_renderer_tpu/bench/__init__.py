"""Benchmark harness: per-scene FPS/latency collection + the 8-scene suite."""

from compute_renderer_tpu.bench.collector import (  # noqa: F401
    PerformanceCollector,
    PerformanceData,
)
from compute_renderer_tpu.bench.suite import benchmark_scene_configs, run_suite  # noqa: F401
