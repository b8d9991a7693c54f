"""Test config: run on 8 virtual CPU devices so data-parallel sharding,
collectives, and queue semantics are testable without a TPU
(SURVEY.md §4's recommended strategy).

Host-level hardening (round-2 verdict: the suite aborted with a native
SIGABRT before printing its summary, 2/3 times mid-suite and once after
[100%]). Round-3 root-caused all three failure modes:

1. **Mid-suite SIGABRT (the flaky-red gate)** — XLA:CPU's in-process
   collective rendezvous terminates the process when the 8 virtual
   devices' participant threads fail to meet within a hard 40 s window
   (rendezvous.cc LOG(FATAL)). Root cause (ptrace stack scans of two
   live hangs, docs/design.md): free-running dispatch loops saturate
   the per-device inflight-computation semaphore, starving the
   remaining participants on this 1-core host. Fixes: tests that loop
   over a multi-device step fetch one scalar per step (the production
   dispatch profile of runner.py); ASYNC dispatch is kept (sync
   dispatch drops the semaphore to capacity 1 — a PERMANENT collective
   deadlock); and the termination timeout below gives margin for
   suite-load scheduling jitter. The F-log lands in pytest's captured
   stderr and dies with the process, which is why the abort looks
   silent.
2. The persistent XLA compile cache is keyed by a fingerprint of the
   host CPU's feature flags: XLA:CPU AOT results are machine-specific,
   and loading entries compiled on a previous round's (different) host
   prints "could lead to execution errors such as SIGILL" (observed
   live on this cache).
3. The environment's sitecustomize registers an out-of-process
   accelerator PJRT plugin at interpreter start; its .so stays dlopen'd
   in the test process even when jax is forced onto CPU (verified via
   /proc/self/maps), and native teardown of such a plugin (or a
   worker thread still alive at interpreter shutdown) can abort the
   process AFTER the run is over. pytest_unconfigure flushes the
   summary and exits via os._exit — a guard, not a mask: failures
   still report normally, and an abort DURING the run is unaffected.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # ROOT CAUSE of the round-2 "Fatal Python error: Aborted" (SIGABRT):
    # XLA:CPU cross-device collectives rendezvous all 8 virtual devices'
    # threads with a hard 40 s termination timeout (rendezvous.cc:127
    # "Expected 8 threads to join the rendezvous, but only 7 arrived on
    # time" -> LOG(FATAL) -> abort). On a 1-core host the 8 participant
    # threads multiplex one CPU, and under suite-load scheduling jitter a
    # participant occasionally misses the 40 s window. The F-log went to
    # pytest's captured stderr and died with the process, which is why
    # the abort looked silent. Raise the termination timeout far above
    # any plausible scheduling delay.
    flags = (flags
             + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
             + " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin that force-
# selects itself via jax.config (overriding JAX_PLATFORMS from the env),
# so the override must happen in-process, before any backend init.
jax.config.update("jax_platforms", "cpu")

# NOTE: keep ASYNC cpu dispatch (the default). Synchronous dispatch
# deadlocks 8-device collectives on this host — capacity-1 inflight
# semaphore vs a blocking rendezvous (see module docstring, point 1).


# Persistent XLA compile cache: the suite's wall-clock is dominated by
# repeated jit compiles of near-identical tiny-arch steps; cache them
# across tests AND across runs — but never across COMPILE TARGETS: the
# directory is keyed by the actual XLA:CPU compile-target feature string
# (extracted from a canary executable — exactly what cpu_aot_loader
# validates at load), falling back to a cpuinfo fingerprint when the
# probe is unavailable (hmmc_tpu.utils.xla_cache.cache_fingerprint).
# Two machines whose XLA picks different target features — however
# similar their cpuinfo — can never share AOT entries, which is what
# "could lead to execution errors such as SIGILL" warned about.
# (runner._enable_compile_cache respects an already-configured cache
# dir, so CLI-smoke tests share this one.)
from hmmc_tpu.utils.xla_cache import cache_fingerprint  # noqa: E402

_cache = os.path.join(
    os.path.expanduser("~"), ".cache",
    f"hmmc_tpu_test_xla_{cache_fingerprint()}")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Persistent-cache robustness (docs/design.md "Test-gate reliability"):
# jax's LRUCache.put writes entries NON-atomically (plain write_bytes, and
# no file lock when eviction is off), so a killed/crashed run — or two
# processes sharing the cache dir — leaves a TORN *-cache file; XLA's
# native deserializer is not hardened against malformed input and
# SIGSEGVs on it, on every later run that reads that key (observed live
# 2026-08-18: deterministic mid-suite segfaults inside
# compilation_cache.get_executable_and_time while the same test passes in
# isolation). harden_cache_writes() makes puts atomic (temp + os.replace)
# so this cannot recur.
from hmmc_tpu.utils.xla_cache import harden_cache_writes  # noqa: E402

harden_cache_writes()

# NOTE (2026-08-18, negative result recorded in docs/design.md): do NOT
# "defensively" retain strong references to every loaded executable /
# serialized buffer via wrappers on jax's compile+cache-read choke
# points. That experiment — intended as a guard against the jaxlib 0.9.0
# use-after-unmap — itself made `backend.deserialize_executable` SIGSEGV
# *deterministically* at the first heavyweight cache read after ~16
# runner-level tests (reproduced 3/3 with the wrappers, 17/17-pass with
# them disabled, everything else equal). Executable lifetime must stay
# exactly as jax manages it.

import pytest  # noqa: E402


# Collection order for DIRECT multi-module runs (developer loops that
# name several files): heaviest XLA:CPU materializations FIRST, so big
# programs compile while the process is young. In a full-suite session
# this ordering is moot — see _ORCHESTRATOR below: the parent compiles
# nothing and every module runs in a fresh child interpreter.
_RUN_FIRST = ("test_trainer", "test_end_to_end_learning",
              "test_full_parity", "test_eval_pipeline", "test_cli_smoke",
              "test_multihost",
              "test_resnet_import", "test_resnet", "test_models",
              "test_torch_parity", "test_factory_import",
              "test_optimization")

# Full-suite isolation (docs/design.md "Test-gate reliability", crashes
# 1-9): jaxlib 0.9.0's XLA:CPU executable materialization can segfault
# in an AGED process — nine observed crashes, every one a non-trivial
# program materializing after ~90+ tests, never a young process, and
# never the same module once that module was reordered or isolated (the
# fault just moves to the next-largest late compile: test_trainer →
# test_resnet_import → test_randaugment → test_data). So when a session
# collects test_suite_isolation ALONGSIDE other modules (i.e. a
# full-directory run such as the `pytest tests/ -x -q` gate), every
# in-process item is deselected and the orchestrator runs each module
# in a clean child interpreter — the empirically stable shape. Naming
# modules directly keeps them in-process for developer loops.
_ORCHESTRATOR = "test_suite_isolation"


def _item_module(item):
    mod = os.path.basename(item.nodeid.split("::", 1)[0])
    return mod[:-3] if mod.endswith(".py") else mod


def pytest_collection_modifyitems(config, items):
    mods = {_item_module(i) for i in items}
    if _ORCHESTRATOR in mods and len(mods) > 1:
        deselected = [i for i in items
                      if _item_module(i) != _ORCHESTRATOR]
        config.hook.pytest_deselected(items=deselected)
        items[:] = [i for i in items
                    if _item_module(i) == _ORCHESTRATOR]
        return

    rank = {m: i for i, m in enumerate(_RUN_FIRST)}
    items.sort(key=lambda item: rank.get(_item_module(item),
                                         len(_RUN_FIRST)))


# Persistent-cache cutoff: 5 of the 6 observed jaxlib-0.9.0
# materialization crashes were inside the persistent-cache deserialize
# (compilation_cache.get_executable_and_time), and every one struck a
# big program after ~130 in-process tests — reordering alone just moved
# the fault to the next big late deserialize (test_resnet_import at
# ~#136, run 2026-08-19). The _RUN_FIRST modules hold EVERY model-level
# program in the suite (87 tests); once the first test of a non-listed
# (small-program) module runs, the persistent cache is switched off for
# the remainder of the process — so all big materializations get their
# warm-cache reads inside the empirically safe early window (crashes
# were never observed before #136; cli_smoke deserializes at #49-70
# pass every run), and the late window performs NO cache deserializes
# at all; its few small programs compile fresh in seconds. The cutoff
# only triggers after a big module actually ran (the ordering puts them
# first), so running any single file/module directly keeps the cache
# (developer loops).
_run_first_set = set(_RUN_FIRST)
_seen_big = {"v": False}


def pytest_runtest_setup(item):
    mod = os.path.basename(item.nodeid.split("::", 1)[0])
    mod = mod[:-3] if mod.endswith(".py") else mod
    if mod in _run_first_set:
        _seen_big["v"] = True
    elif (_seen_big["v"]
            and jax.config.jax_compilation_cache_dir is not None):
        # NOTE the config updates alone do NOT stop reads: jax memoizes
        # both the is_cache_used verdict and the cache object; only
        # reset_cache() (the supported back-to-pristine API) drops them,
        # after which re-initialization sees the disabled config and the
        # compiler skips the cache code path entirely.
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_enable_compilation_cache", False)
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()

# Debug aid (no-op unless set): re-arm a native SIGABRT backtrace handler
# before every test — some loaded native library replaces signal handlers
# after interpreter start, which silences LD_PRELOAD-installed ones.
_ABORT_TRACE = os.environ.get("_HMMC_ABORT_TRACE")
if _ABORT_TRACE:
    import ctypes

    _at_lib = ctypes.CDLL(_ABORT_TRACE)

    @pytest.fixture(autouse=True)
    def _rearm_abort_trace():
        _at_lib.abort_trace_install()
        yield


_exitstatus = {"code": 0}


def pytest_sessionfinish(session, exitstatus):
    # capture the real status; the terminal summary (a wrapper hook)
    # prints after the regular sessionfinish impls complete
    _exitstatus["code"] = int(exitstatus)


def pytest_unconfigure(config):
    """Runs after the terminal summary is out: exit the process directly,
    bypassing native-library teardown — see module docstring #2."""
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exitstatus["code"])


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
