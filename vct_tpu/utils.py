"""Small host-side utilities (reference ``utils.py`` leftovers that are not
config/earlystop/masking — those live in ``config.py``, ``train/earlystop.py``
and ``ops/attention.py`` respectively)."""

from __future__ import annotations

import random

import numpy as np


def setup_seed(seed: int = 666) -> None:
    """Seed host RNGs (reference ``setup_seed``, ``utils.py:115-123``; 666 at
    ``train.py:308``). Device randomness is explicit PRNG keys in JAX, so the
    reference's cudnn-determinism knobs have no equivalent — XLA is
    deterministic by default."""
    random.seed(seed)
    np.random.seed(seed)
