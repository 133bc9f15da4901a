"""Hyperparameters for t-SNE gradient descent.

Mirrors the reference's ``TSNEParam`` case class
(reference ``TSNEParam.scala:3-11``) with identical defaults.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TSNEParam:
    """t-SNE optimizer constants.

    Attributes (defaults = reference ``TSNEParam.scala:3-11``):
        early_exaggeration: number of iterations during which P is
            multiplied by ``exaggeration_factor``.
        exaggeration_factor: the early-exaggeration multiplier.
        t_momentum: iteration at which momentum switches from
            ``initial_momentum`` to ``final_momentum``.
        initial_momentum / final_momentum: momentum schedule.
        eta: learning rate.
        min_gain: floor for the adaptive per-coordinate gains.
    """

    early_exaggeration: int = 100
    exaggeration_factor: float = 4.0
    t_momentum: int = 25
    initial_momentum: float = 0.5
    final_momentum: float = 0.8
    eta: float = 500.0
    min_gain: float = 0.01
