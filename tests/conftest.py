"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no multi-process unit tests at all (SURVEY.md §4); here
every sharding test runs against `--xla_force_host_platform_device_count=8`,
which exercises the same XLA partitioner that runs on a real TPU slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the dryrun tests re-run the driver entry, which appends a budget-bounded
# strategy×mode census; a zero budget skips it here (the census has its own
# focused test + the committed MULTICHIP_CENSUS.json full matrix) so the
# 4-way parametrized dryrun test doesn't pay ~35 s/production-compile each
os.environ.setdefault("DVAE_DRYRUN_CENSUS_BUDGET_S", "0")

import sys  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS to the TPU plugin;
# the config update (post-import, pre-backend-init) reliably forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True)
def _close_figures():
    """Plot helpers return figures for the caller to own; tests that don't
    save them would otherwise accumulate >20 open pyplot figures (a
    RuntimeWarning and real memory).  Only acts when matplotlib is already
    imported, so non-plotting tests pay nothing."""
    yield
    plt = sys.modules.get("matplotlib.pyplot")
    if plt is not None:
        plt.close("all")
