"""Test configuration: CPU backend, float64, 8 virtual devices.

Parity with the reference (<=1e-8) requires float64; multi-device sharding
tests run on a virtual 8-device CPU mesh (SURVEY.md section 4).
"""

import os
import sys

# force-override: the session environment may pin JAX_PLATFORMS to a TPU
# plugin; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The session may have registered a TPU PJRT plugin at interpreter startup
# (sitecustomize), which overrides the env var; force the CPU platform via
# the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache (keyed by HLO hash; shared with bench.py): the
# heavy CPU-x64 compiles — layered f-k jacobians, the OT pipeline grad —
# are paid once, not per pytest run
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/wot_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import json  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests_golden_ref.json")
REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def golden():
    """Golden values captured from a verified run of the reference library."""
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def reference_libs():
    """The actual reference modules, if mounted (for live parity tests)."""
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference repo not available")
    sys.path.insert(0, REFERENCE_PATH)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        from libs import FingerprintLib, OTlib, ricker_util  # noqa: F401
    return {"OTlib": OTlib, "FingerprintLib": FingerprintLib,
            "ricker_util": ricker_util}


@pytest.fixture(scope="session")
def reference_loc_cmt(reference_libs):
    """The reference loc_cmt_util module, imported with pyprop8 stubbed.

    pyprop8 is not installable in this sandbox (no network); loc_cmt_util
    imports it at module level but many of its functions are pure numpy, so
    a fake module in sys.modules lets the real reference code be tested.
    """
    import types

    if "pyprop8" not in sys.modules:
        pp = types.ModuleType("pyprop8")
        utils = types.ModuleType("pyprop8.utils")
        for name in ("rtf2xyz", "make_moment_tensor", "stf_trapezoidal",
                     "clp_filter"):
            setattr(utils, name, None)
        pp.utils = utils
        sys.modules["pyprop8"] = pp
        sys.modules["pyprop8.utils"] = utils
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        from libs import loc_cmt_util
    return loc_cmt_util


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
