"""TPU-native groove-infilling framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
pelinski/TransformerGrooveInfilling (see /root/repo/SURVEY.md): transformer drum-loop
infilling over HVO (hits/velocity/offset) grids, with a symbolic and a direct-audio
("MSO") input modality, the GrooveEvaluator-style metric suite, YAML-config training
CLI, and a host-side C++ soundfont synthesizer feeding a fused on-device DSP pipeline.

Layering (bottom → top), mirroring SURVEY.md §1 but TPU-first:

- ``hvo``       L1: fixed-shape HVO representation + vectorized grid ops
- ``audio``     L0: native (C++) soundfont/procedural drum synthesis on the host
- ``ops``       Pallas/XLA kernels: fused attention, MSO multiband-onset DSP
- ``models``    L4: flax transformer encoder(-decoder) with h/v/o heads + losses
- ``parallel``  device mesh + sharding rules (dp × tp over ICI)
- ``data``      L2/L3: GMD subsetting, infilling task datasets, batch pipeline
- ``eval``      L5: InfillingEvaluator equivalent (metrics, features, media)
- ``train``     L6: config system, train loop, checkpointing, eval scheduling
- ``utils``     logging (wandb-compatible shim), serialization
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TGI_PLATFORM"):
    # explicit backend override (e.g. TGI_PLATFORM=cpu for host-only runs);
    # needed because this image's sitecustomize force-selects the tunneled TPU
    # regardless of JAX_PLATFORMS. Deliberately NOT honoring JAX_PLATFORMS
    # here: the image exports JAX_PLATFORMS=axon globally, so treating it as
    # a user request would re-route explicitly CPU-pinned processes (e.g.
    # the test suite's jax.config.update) back to the tunnel.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["TGI_PLATFORM"])
    except Exception:
        pass  # backend already initialized; keep whatever is active

# persistent XLA compile cache for every entry point (tests set their own in
# conftest.py): on the tunneled TPU the first-block compiles dominate run
# startup (~minutes of an 8-minute production run), and they are identical
# across runs of the same config. Opt out with TGI_COMPILE_CACHE=0 or point
# TGI_COMPILE_CACHE at a directory.
_cache = _os.environ.get("TGI_COMPILE_CACHE", "")
if _cache != "0" and not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax as _jax

    def _machine_cache_dir():
        # ~/.cache persists across VM reincarnations whose host CPUs differ;
        # XLA:CPU AOT artifacts compiled for one host's feature set spam
        # cpu_aot_loader warnings (and risk SIGILL) on the next. Key the
        # default cache dir by a CPU-feature fingerprint so each machine
        # generation gets its own cache instead of tripping over stale AOT.
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            flags = ""
        fp = hashlib.sha1(flags.encode()).hexdigest()[:10]
        return _os.path.expanduser(f"~/.cache/tgi_xla_{fp}")

    try:
        _jax.config.update(
            "jax_compilation_cache_dir", _cache or _machine_cache_dir())
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs: compile uncached
