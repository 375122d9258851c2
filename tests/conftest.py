"""Test configuration: hermetic CPU JAX with an 8-device virtual mesh.

Must run before any jax import. Device-kernel tests run on CPU (Pallas via
interpret mode); real-TPU runs happen through bench.py and the driver.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS at interpreter start; undo that here so tests are
# hermetic-CPU (the env var alone is not enough).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: the interpret-mode composites dominate
# suite time and recompile identically on every pytest process otherwise
# (engines constructed directly never call Realigner's cache setup)
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "NPORE_JAX_CACHE", os.path.expanduser("~/.cache/npore_jax")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DATA = os.path.join(REPO, "tests", "data")
STATS = os.path.join(REPO, "guppy5_stats")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def data_dir():
    return DATA


@pytest.fixture(scope="session")
def stats_dir():
    return STATS


@pytest.fixture(scope="session")
def score_matrices():
    from npore_tpu.model.scores import (calc_score_matrices,
                                        load_confusion_matrices)
    subs, nps, inss, dels = load_confusion_matrices(STATS)
    return calc_score_matrices(subs, nps, inss, dels)
