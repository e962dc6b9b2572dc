"""Test fixtures. JAX is forced to a virtual 8-device CPU backend *before* it
initializes, which is how multi-chip sharding is tested without TPUs
(SURVEY.md §4's implication list)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# The machine image may pre-import jax at interpreter startup (sitecustomize)
# with a TPU backend already selected; the env var above is then too late, but
# the config flag still wins as long as no backend has been initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(666)  # reference seeds 666 (train.py:308)
