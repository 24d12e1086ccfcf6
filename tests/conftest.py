"""Test config: force an 8-device virtual CPU mesh before jax initializes.

This substitutes for the reference's (nonexistent) fake cluster — multi-device
sharding paths are exercised on host CPU devices (SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests run CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Plugins (jaxtyping) may have imported jax before this conftest ran, in which
# case jax.config already latched JAX_PLATFORMS=axon from the environment.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Tiered suite: tests/slow_tests.txt lists the nodeids of measured-slow tests
# (regenerate with scripts/update_slow_tier.py from a `--durations=0` log).
# `pytest -m "not slow"` is the <2 min smoke tier; the full suite (~30 min on
# this box) stays the merge gate. Unlisted new tests default to the smoke
# tier until the list is regenerated.
# ---------------------------------------------------------------------------

_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _load_slow_ids():
    try:
        with open(_SLOW_FILE) as f:
            return {ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow_ids = _load_slow_ids()
    if not slow_ids:
        return
    # entries are exact nodeids ("tests/test_cli.py::test_x[p]") or
    # file/class prefixes ("tests/test_detection.py",
    # "tests/test_models.py::TestFLMR") marking everything under them —
    # used for tests sharing an expensive module/class-scoped fixture
    # (pytest bills the fixture to whichever test runs first, so the
    # whole sharing group must sit in the same tier)
    # "::"-suffixed prefixes cover files/classes; "["-suffixed ones let a
    # bare function id mark all its parametrized children (a function id
    # + "::" alone would never prefix "test_y[param]")
    bare = [p for p in slow_ids if "[" not in p]
    prefixes = tuple(p + "::" for p in bare) + tuple(p + "[" for p in bare)
    mark = pytest.mark.slow
    for item in items:
        if item.nodeid in slow_ids or item.nodeid.startswith(prefixes):
            item.add_marker(mark)
