"""Host-keyed persistent-compilation-cache directories.

XLA:CPU AOT executables are compiled against the build host's exact CPU
feature set; loading them on a different host logs
``cpu_aot_loader: ... could lead to execution errors such as SIGILL`` and
can mis-execute. This box's sessions MIGRATE between hosts (observed
2026-08-18: a warm cache built on an AMX/avx512-extended Xeon was read on a
plainer one and broke a test), so every cache directory must be keyed by
the host's CPU identity — a stale cache from another machine then simply
misses instead of poisoning the run.

The key hashes the first ``model name`` and ``flags`` lines of
/proc/cpuinfo (the feature set XLA targets); tag separates regimes that
must never share executables (see tests/conftest.py: the TPU-tunnel plugin
flips process-global codegen state, so CLI/bench and test caches are
distinct even on one host).
"""

from __future__ import annotations

import hashlib
import platform


def _host_key() -> str:
    key = [platform.machine()]
    seen = set()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                field = line.split(":", 1)[0].strip()
                if field in ("model name", "flags") and field not in seen:
                    seen.add(field)
                    key.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        key.append(platform.processor())
    return "\n".join(key)


def host_cache_dir(tag: str) -> str:
    """A per-host, per-regime jax_compilation_cache_dir path."""
    h = hashlib.sha1(_host_key().encode()).hexdigest()[:10]
    return f"/tmp/jax_cache_{tag}_{h}"
