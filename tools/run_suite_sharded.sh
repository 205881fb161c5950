#!/usr/bin/env bash
# Process-isolated test-suite runner (fence for the XLA persistent-cache
# serialize/deserialize segfault — ROADMAP "Known issue").
#
# The only configuration that ever crashed is the FULL suite in ONE
# process: ~350 tests, ~245 loaded C extensions, hundreds of live
# LoadedExecutables, with XLA:CPU (de)serializing persistent-cache
# entries inside that heap state.  Every crashing test passes in a fresh
# process with the same cache, and the committed stress repro
# (experiments/xla_cache_segfault_repro.py) cannot reproduce it outside
# the real suite.  This runner shards the suite across K sequential
# pytest processes (round-robin by test file), so all persistent-cache
# I/O happens in small, short-lived heaps — the crash preconditions are
# never assembled while keeping the disk cache (and its speed) on.
#
#   tools/run_suite_sharded.sh [K]     # default K=4
#
# Exit status is non-zero if any shard fails.  Shard logs go to
# /tmp/hebo_suite_shard_<i>.log; a one-line summary prints per shard.
set -u
K="${1:-4}"
cd "$(dirname "$0")/.."

mapfile -t FILES < <(ls tests/test_*.py | sort)
rc=0
for ((i = 0; i < K; i++)); do
    SHARD=()
    for ((j = i; j < ${#FILES[@]}; j += K)); do
        SHARD+=("${FILES[$j]}")
    done
    [ ${#SHARD[@]} -eq 0 ] && continue
    log="/tmp/hebo_suite_shard_${i}.log"
    echo "shard $((i + 1))/$K: ${#SHARD[@]} files -> $log"
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -m pytest "${SHARD[@]}" -q >"$log" 2>&1
    s=$?
    tail -n 1 "$log"
    [ $s -ne 0 ] && rc=$s
done
exit $rc
