#!/usr/bin/env bash
# Populate the host-keyed test compile cache (cache.host_cache_dir
# "cpu_tests") safely: one pytest process per test
# file, with cache writes enabled (GRAFT_CACHE_WRITE=1). The XLA:CPU
# executable.serialize() segfault that motivates this only reproduces when
# certain sharded executables are compiled AFTER unrelated compiled state
# in the same process; per-file processes have never triggered it.
# Usage: scripts/warm_test_cache.sh [pytest-args...]
set -u
cd "$(dirname "$0")/.."
rc=0
for f in tests/test_*.py; do
    echo "=== $f ==="
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu GRAFT_CACHE_WRITE=1 \
        timeout 3600 python -m pytest "$f" -q "$@"
    r=$?
    if [ "$r" -ne 0 ]; then
        echo "!!! $f exited $r"
        rc=1
    fi
done
exit $rc
