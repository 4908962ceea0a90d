"""Test configuration: run all tests on the CPU backend with 8 virtual
devices, so multi-chip sharding tests work without TPU hardware and Pallas
kernels run in interpret mode."""

import os
import sys

# The host sitecustomize initializes a TPU-tunnel PJRT plugin at interpreter
# startup when JAX_PLATFORMS selects it; that initialization flips
# process-global XLA codegen state (excess precision) that nothing in this
# process can undo, and which breaks the suite's bitwise backend-parity
# contracts by 1 ULP. If this interpreter started in that state, re-exec
# pytest once with JAX_PLATFORMS=cpu so the plugin stays inert. The exec is
# deferred to pytest_configure so pytest's fd capture can be suspended first
# (otherwise the re-exec'd run's output lands in a discarded capture file).
_NEEDS_REEXEC = (
    (
        os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
        # The sitecustomize registers the tunnel plugin whenever the pool
        # env var is present; with the relay down, the very first
        # ``import jax`` then hangs forever even under JAX_PLATFORMS=cpu.
        # Re-exec with the pool var dropped so the plugin is never
        # registered in the test interpreter.
        or os.environ.get("PALLAS_AXON_POOL_IPS")
    )
    and os.environ.get("_GRAFT_PYTEST_REEXEC") != "1"
)


def _split_suite_argv():
    """When pytest was invoked on the WHOLE tests/ tree in one process,
    return (per-file targets, passthrough options, fail_fast); else None.

    Why: XLA:CPU segfaults order-dependently when certain executables are
    compiled/loaded after enough unrelated compiled state accumulates in
    one process — with the full suite (~180 tests, including 8-virtual-
    device sharded programs) a single-process run reliably dies ~55% in
    (rc=139, observed 2026-08-18 in compile, serialize AND post-warm load
    paths). Per-FILE processes have never crashed, so a whole-suite
    invocation is transparently re-run as one pytest process per test
    file with the same options; a targeted invocation (specific file or
    test id) is left alone."""
    import glob

    opts, positionals, fail_fast = [], [], False
    for a in sys.argv[1:]:
        if a in ("-x", "--exitfirst"):
            # Forward to children (stop within a file) AND stop the
            # file loop at the first failing file.
            fail_fast = True
            opts.append("-x")
        elif a.startswith("-"):
            # Don't split invocations this simple splitter cannot honor:
            # value-taking selectors (option/positional parsing becomes
            # ambiguous), collect-only, and single-artifact report outputs
            # (every child would clobber the same file).
            if (a in ("-k", "-m", "-o", "-p", "-c", "--collect-only",
                      "--co")
                    or a.startswith(("--junit", "--html", "--cov",
                                     "--json", "--report", "--result"))):
                return None
            opts.append(a)
        else:
            positionals.append(a.rstrip("/"))
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    if not positionals:
        if os.path.abspath(os.getcwd()) != root:
            return None
    elif any(os.path.abspath(p) not in {here, root} for p in positionals):
        return None
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    if len(files) < 2:
        return None
    return files, opts, fail_fast


# Decided at module level so the split-orchestrator parent (which only
# spawns subprocesses) skips the jax import / backend init below.
_SPLIT = (None if os.environ.get("_GRAFT_SPLIT_SUITE") == "1"
          else _split_suite_argv())


def pytest_configure(config):
    split = _SPLIT
    if not _NEEDS_REEXEC and split is None:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["_GRAFT_PYTEST_REEXEC"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    sys.stdout.flush()
    sys.stderr.flush()
    if split is None:
        os.execve(
            sys.executable,
            [sys.executable, "-m", "pytest", *sys.argv[1:]],
            env,
        )
    # Whole-suite invocation: one pytest process per file (see
    # _split_suite_argv). Aggregate exit codes; honor -x across files.
    import subprocess

    files, opts, fail_fast = split
    env["_GRAFT_SPLIT_SUITE"] = "1"
    rc = 0
    for f in files:
        print(f"=== {os.path.relpath(f)} ===", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", f, *opts], env=env
        ).returncode
        # rc 5 = "no tests collected" (e.g. an all-skipped file): fine.
        if r not in (0, 5):
            rc = r if rc == 0 else rc
            if fail_fast:
                break
    print(f"=== suite {'PASSED' if rc == 0 else f'FAILED rc={rc}'} "
          f"(per-file processes; see tests/conftest.py) ===", flush=True)
    os._exit(rc)


if not _NEEDS_REEXEC and _SPLIT is None:
    # Force (not setdefault): the host environment pins JAX_PLATFORMS to the
    # TPU tunnel; tests must run on CPU with virtual devices.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.clear_backends()
        except AttributeError:
            import jax.extend.backend

            jax.extend.backend.clear_backends()
        assert jax.default_backend() == "cpu"

    # Persistent compilation cache: this box has a single CPU core, so XLA
    # compile time dominates test wall-clock. Cache compiled executables
    # across runs. The directory is SEPARATE from the TPU/CLI cache
    # (the cache key captures neither the plugin's process-global codegen
    # state nor CPU target features, so sharing a cache across regimes mixes
    # 1-ULP-different executables and breaks the bitwise backend-parity
    # tests) and HOST-KEYED (sessions migrate between machines; a warm cache
    # from another host's CPU features mis-executes — see cache.py).
    from compute_renderer_tpu.cache import host_cache_dir

    jax.config.update("jax_compilation_cache_dir", host_cache_dir("cpu_tests"))
    # Cache WRITES are opt-in: XLA:CPU's executable.serialize() segfaults
    # (order-dependently) on some 8-virtual-device sharded executables when
    # other compiled state precedes them in-process, killing the whole
    # pytest run at cache-write time. Reads are keyed purely by hash and are
    # safe, so the default is a read-only warm cache; populate it with
    # scripts/warm_test_cache.sh (one pytest process per test file — the
    # per-file orders have never triggered the serialize crash).
    if os.environ.get("GRAFT_CACHE_WRITE") == "1":
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    else:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1e9
        )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update(
        "jax_persistent_cache_enable_xla_caches",
        "xla_gpu_per_fusion_autotune_cache_dir",
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
