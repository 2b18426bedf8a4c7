"""Test harness config.

Tests run on CPU with 8 virtual XLA host devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: the fake-backend substitute for a
real pod). Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compile cache: repeated test runs skip XLA recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tgi")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-selects the tunneled TPU backend ("axon,cpu")
# regardless of JAX_PLATFORMS; on this 1-CPU host every eager op then pays a
# ~1 s network round-trip. Override before any backend initialization —
# unless TGI_TEST_TPU=1 explicitly opts into the real chip (the only way to
# exercise the TPU-only Pallas PRNG paths, e.g. tests/test_fused_ln.py).
if not os.environ.get("TGI_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    # On-chip suite integrity: TGI_TEST_TPU=1 results are recorded as
    # real-TPU evidence (docs/TESTS_TPU.md), so a silent fall-back to a
    # host backend must abort the run loudly instead of minting CPU passes
    # labeled as on-chip. (JAX_PLATFORMS=axon is strict today, so this only
    # fires if the platform config ever grows a fallback.)
    if jax.default_backend() != "tpu":
        # raw fd 2 — pytest capture may already hold sys.stderr
        os.write(2, ("\nTPU_BACKEND_UNAVAILABLE (default_backend="
                     f"{jax.default_backend()})\n").encode())
        os._exit(78)
    # On-chip CORRECTNESS runs pin f32 matmuls to true f32 accuracy: the
    # TPU default lowers every f32 dot to bf16 MXU passes (~1e-3 relative
    # error), which drowns the suite's f32-tolerance parity assertions
    # (torch golden outputs, the loop-based MSO oracle) in hardware
    # rounding — 19 round-4 on-chip "failures" were this. Production code
    # picks bf16 EXPLICITLY via compute_dtype (bf16 inputs are unaffected
    # by this flag), and perf is measured by the bench scripts, not here.
    jax.config.update("jax_default_matmul_precision", "highest")

import pathlib
import sys

# repo root on sys.path so `import transformergrooveinfilling_tpu` works from tests/
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pytest

# Per-TEST watchdog for the on-chip suite runner (scripts/run_tpu_suite.py).
# A wedged TPU dispatch blocks in C and never returns to Python, so neither
# SIGALRM nor pytest-level timeouts can interrupt it — the only reliable
# recovery is killing the process. The watchdog thread prints a parseable
# marker and os._exit(77)s; the runner deselects the wedged test and re-runs
# the file, so one wedge costs ~TGI_PER_TEST_TIMEOUT_S seconds instead of the
# whole 2400 s file budget (round 4 lost 4×2400 s to one such test).
_PER_TEST_TIMEOUT = float(os.environ.get("TGI_PER_TEST_TIMEOUT_S", 0) or 0)
if _PER_TEST_TIMEOUT > 0:
    import threading

    def _watchdog_fire(nodeid):
        # The marker must survive os._exit(77) under pytest's DEFAULT
        # fd-level capture: fd 2 is dup2'd to a capture tempfile that
        # os._exit never flushes back, so a raw os.write(2, ...) is LOST
        # (observed round 5: the runner saw exit 77 with no marker and
        # logged '<unparsed>'). The reliable channel is a sidecar file the
        # runner names via TGI_WATCHDOG_FILE; raw fd 2 stays as a
        # best-effort human trace.
        wd_file = os.environ.get("TGI_WATCHDOG_FILE")
        if wd_file:
            try:
                with open(wd_file, "a") as f:
                    f.write(f"WATCHDOG_TIMEOUT {nodeid}\n")
                    f.flush()
                    os.fsync(f.fileno())
            except OSError:
                pass
        os.write(2, f"\nWATCHDOG_TIMEOUT {nodeid}\n".encode())
        os._exit(77)

    @pytest.hookimpl(hookwrapper=True)
    def pytest_runtest_protocol(item, nextitem):
        timer = threading.Timer(_PER_TEST_TIMEOUT, _watchdog_fire,
                                (item.nodeid,))
        timer.daemon = True
        timer.start()
        try:
            yield
        finally:
            timer.cancel()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REPO = str(pathlib.Path(__file__).resolve().parents[1])


def ensure_dataset_artifacts(experiment: str, *, testing: bool = False,
                             evaluators: bool = False) -> None:
    """Build the gitignored dataset (and optionally evaluator) pickles for
    ``experiment`` when a fresh checkout lacks them.

    They are generated artifacts (reference README.md:64-78 ships them as a
    data download; here the hermetic synthetic corpus regenerates them in
    seconds), so tests that drive the CLI surface build them on demand instead
    of assuming a previously-populated ``datasets/`` tree.
    """
    import yaml

    name = experiment + ("_testing" if testing else "")
    with open(os.path.join(REPO, "configs/paths.yaml")) as f:
        paths = yaml.safe_load(f)[name]
    ds_done = all(os.path.isdir(os.path.join(REPO, p))
                  for p in paths["datasets"].values())
    ev_done = (not evaluators) or all(
        os.path.exists(os.path.join(REPO, p))
        for p in paths.get("evaluators", {}).values())
    if ds_done and ev_done:
        return

    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        argv = ["--experiments", experiment] + (["--testing"] if testing else [])
        if not ds_done:
            import process_dataset as pd_cli

            pd_cli.main(argv)
        if evaluators and not ev_done:
            import process_evaluator as pe_cli

            pe_cli.main(argv)
    finally:
        os.chdir(cwd)


DEMO_CHECKPOINT = "/root/reference/demo/transformer_run_171tyqit_Epoch_1.Model"


@pytest.fixture(scope="session")
def demo_checkpoint_path():
    if not os.path.exists(DEMO_CHECKPOINT):
        pytest.skip("reference demo checkpoint not available")
    return DEMO_CHECKPOINT
