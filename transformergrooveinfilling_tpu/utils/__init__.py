"""Shared utilities: experiment logging (wandb-compatible), serialization."""

from . import logging
from .serialization import NpEncoder, save_to_pickle, load_pickle

__all__ = ["logging", "NpEncoder", "save_to_pickle", "load_pickle"]
