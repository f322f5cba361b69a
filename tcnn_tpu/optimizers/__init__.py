"""Optimizer factory (reference: src/optimizer.cu:49-80; default Adam)."""

from __future__ import annotations

from typing import Dict, Optional

from ..common import json_value
from .adam import AdamOptimizer
from .base import Optimizer
from .composite import CompositeOptimizer
from .novograd import NovogradOptimizer
from .sgd import SGDOptimizer
from .wrappers import (
    AverageOptimizer,
    BatchedOptimizer,
    EmaOptimizer,
    ExponentialDecayOptimizer,
    LookaheadOptimizer,
)


def create_optimizer(optimizer: Optional[Dict] = None) -> Optimizer:
    optimizer = optimizer or {}
    otype = json_value(optimizer, "otype", "Adam").lower()
    if otype == "adam":
        return AdamOptimizer(optimizer)
    if otype == "average":
        return AverageOptimizer(optimizer)
    if otype == "batched":
        return BatchedOptimizer(optimizer)
    if otype == "composite":
        return CompositeOptimizer(optimizer)
    if otype == "ema":
        return EmaOptimizer(optimizer)
    if otype == "exponentialdecay":
        return ExponentialDecayOptimizer(optimizer)
    if otype == "lookahead":
        return LookaheadOptimizer(optimizer)
    if otype == "novograd":
        return NovogradOptimizer(optimizer)
    if otype == "sgd":
        return SGDOptimizer(optimizer)
    if otype == "shampoo":
        from .shampoo import ShampooOptimizer

        return ShampooOptimizer(optimizer)
    raise ValueError(f"Invalid optimizer type: {otype}")


__all__ = [
    "AdamOptimizer",
    "AverageOptimizer",
    "BatchedOptimizer",
    "CompositeOptimizer",
    "EmaOptimizer",
    "ExponentialDecayOptimizer",
    "LookaheadOptimizer",
    "NovogradOptimizer",
    "Optimizer",
    "SGDOptimizer",
    "create_optimizer",
]
