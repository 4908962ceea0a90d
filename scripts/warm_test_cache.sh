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
run_pytest() {
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu GRAFT_CACHE_WRITE=1 \
        timeout 3600 python -m pytest "$@"
}
for f in tests/test_*.py; do
    echo "=== $f ==="
    case "$f" in tests/test_sharding*.py) per_test=1 ;; *) per_test=0 ;; esac
    if [ "$per_test" = "1" ]; then
        # One process PER TEST here: these files accumulate enough
        # 8-virtual-device compiled state in one process that XLA:CPU's
        # order-dependent segfault (compile/serialize of a later program
        # after that state) fires even per-file (observed 2026-08-18).
        # Per-test processes keep every compile+write near a fresh state.
        ids=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
              python -m pytest "$f" --collect-only -q 2>/dev/null \
              | grep '::')
        if [ -z "$ids" ]; then
            # Collection produced nothing (import error, collect crash):
            # fall through to the normal per-file run so the failure is
            # executed and reported instead of silently skipped.
            echo "!!! $f collected no tests; running per-file"
        else
            # while-read keeps parametrized ids with spaces/brackets
            # intact (an unquoted $(...) loop would word-split/glob them).
            while IFS= read -r t; do
                echo "--- $t ---"
                run_pytest "$t" -q "$@"
                r=$?
                if [ "$r" -ne 0 ]; then
                    echo "!!! $t exited $r"
                    rc=1
                fi
            done <<EOF
$ids
EOF
            continue
        fi
    fi
    run_pytest "$f" -q "$@"
    r=$?
    if [ "$r" -ne 0 ]; then
        echo "!!! $f exited $r"
        rc=1
    fi
done
exit $rc
