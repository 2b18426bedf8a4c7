"""Device-side kernels and DSP: fused attention, MSO multiband-onset pipeline."""

from .mso import MSOParams, mso_from_audio, mso_batch, mso_batch_from_hvo

__all__ = ["MSOParams", "mso_from_audio", "mso_batch", "mso_batch_from_hvo"]
