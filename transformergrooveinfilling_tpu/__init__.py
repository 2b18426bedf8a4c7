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
