"""Driver-side optimizer update: adaptive gains + momentum + recenter.

Vectorized numpy twin of reference ``TSNEHelper.update``
(``TSNEHelper.scala:31-56``): gains +0.2 where the gradient's sign
disagrees with the velocity's (the exact test is ``(dY>0) != (iY>0)``,
replicated including its zero-handling), ×0.8 otherwise, floored at
``min_gain``; velocity ``iY = momentum·iY − η·gain·dY``; ``Y += iY``;
then re-center Y by its column means (``TSNEHelper.scala:54-56``).
Momentum switches 0.5 → 0.8 after ``t_momentum`` iterations.
"""

from __future__ import annotations

import numpy as np

from spark_tsne_spark.params import TSNEParam


def update(
    Y: np.ndarray,
    dY: np.ndarray,
    iY: np.ndarray,
    gains: np.ndarray,
    iteration: int,
    param: TSNEParam,
) -> np.ndarray:
    """Mutates Y, iY, gains in place; returns Y (API parity)."""
    momentum = (
        param.initial_momentum if iteration <= param.t_momentum else param.final_momentum
    )
    flip = (dY > 0.0) != (iY > 0.0)
    np.copyto(gains, np.where(flip, gains + 0.2, gains * 0.8))
    np.maximum(gains, param.min_gain, out=gains)
    iY *= momentum
    iY -= param.eta * gains * dY
    Y += iY
    Y -= Y.mean(axis=0)
    return Y
