"""Test harness: force an 8-device virtual CPU mesh so multi-device sharding
paths (all-gather contrastive loss, pjit train steps) are exercised without TPU
hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The env var alone is not honored when a TPU plugin (axon) is present —
# force CPU explicitly so tests never ride the hardware tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Interpret-mode pallas programs run their loads/stores/DMA-clock updates
# as io_callbacks on a runtime callback thread, and those callbacks
# dispatch EAGER jax ops; with async dispatch the main thread keeps
# dispatching its own eager ops (an un-jitted apply, an eager grad
# transpose) while the callbacks are in flight, and the two eager
# dispatchers deadlock.  Hit 3 full-suite runs on 2026-08-21 (stacks in
# docs/ROUND5_NOTES.md: interpret `store` /
# `update_clocks_for_device_barrier` on the callback thread vs eager
# `square`/`dot_general_transpose` on the main thread).  Fix: SYNCHRONOUS
# dispatch — every eager op, callbacks included, completes before the next
# dispatch.  Scoped to the modules that use force_tpu_interpret_mode /
# interpret=True (fixture below): suite-wide it cost ~5 min of full-suite
# wall (21:26 vs 16:14); cross-module callback trailing is closed by
# _drain_pending_effects.
_INTERPRET_MODULES = {
    "test_context_parallel", "test_flash_attention", "test_quant",
    "test_fallback_and_fused", "test_llm", "test_round2_utils",
}

# Persistent XLA compilation cache for the CPU test runs: the suite's wall
# time is dominated by hundreds of small jit compiles (VERDICT r4 #8); a
# warm cache loads them in ms.  Safe here — tests are pinned to the CPU
# backend above, so the axon-relay hit pathology (core/compilation_cache.py)
# never applies.  Configured directly (not via enable_compilation_cache,
# whose relay guard reads the outer JAX_PLATFORMS env, which may say
# "axon" even though this process is forced to CPU).
_cache_dir = os.environ.get(
    "CTPA_TEST_XLA_CACHE",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_tests"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mesh8():
    from ctpa.core.config import MeshConfig
    from ctpa.core.mesh import create_mesh

    return create_mesh(MeshConfig(data_parallel=8, model_parallel=1))


@pytest.fixture(autouse=True)
def _sync_dispatch_for_interpret_modules(request):
    """See _INTERPRET_MODULES above: synchronous dispatch wherever
    interpret-mode io_callbacks can be in flight, async everywhere else."""
    name = getattr(getattr(request, "module", None), "__name__",
                   "").rsplit(".", 1)[-1]
    if name in _INTERPRET_MODULES:
        jax.config.update("jax_cpu_enable_async_dispatch", False)
        yield
        jax.config.update("jax_cpu_enable_async_dispatch", True)
    else:
        yield


@pytest.fixture(autouse=True)
def _drain_pending_effects():
    """Interpret-mode pallas programs run their loads/stores as io_callbacks
    on a runtime callback thread, and those callbacks themselves dispatch
    EAGER jax ops; they can still be in flight after the program's outputs
    are fetched.  If the next test (or the next statement) then dispatches
    eager ops from the main thread, the two dispatches can deadlock
    (captured 2026-08-21: callback thread inside interpret_pallas_call
    `store` -> jax.Array genexpr, main thread inside eager `square` from a
    LayerNorm — suite hung in test_context_parallel on 2 of 3 runs that
    day).  Draining pending effects after every test closes the cross-test
    window; multi-program interpret tests also barrier internally.  Cost
    when nothing is pending: ~0."""
    yield
    jax.effects_barrier()


@pytest.fixture(autouse=True)
def _hang_watchdog():
    """Interpret-mode pallas tests very rarely deadlock (0% CPU, io-callback
    race inside JAX's interpreter; see _INTERPRET_MODULES above for the
    warm-cache aggravation).  A silent hang wastes a whole CI slot — instead
    dump every thread's stack and kill the run after 15 min so the log shows
    WHERE it stuck.  The timer is re-armed per test and cancelled on
    completion; no passing test is affected.  The dump goes to a DEDICATED
    file (default /tmp/ctpa_test_watchdog_dump.txt): pytest's fd-level
    capture owns both sys.stderr and fd 2 at arm time, so dumps written to
    either die with the process — both suite hangs of 2026-08-21 exited
    with empty logs until this was a separate file."""
    import faulthandler

    timeout = float(os.environ.get("CTPA_TEST_WATCHDOG_S", "900"))
    path = os.environ.get("CTPA_TEST_WATCHDOG_DUMP",
                          "/tmp/ctpa_test_watchdog_dump.txt")
    f = open(path, "a")
    faulthandler.dump_traceback_later(timeout, exit=True, file=f)
    yield
    faulthandler.cancel_dump_traceback_later()
    f.close()
