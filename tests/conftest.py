"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (mirrors SURVEY.md §4 strategy).

Note: this image's sitecustomize force-registers the axon TPU platform and
prepends it to jax_platforms, so setting the env var alone is not enough —
we must override the config after importing jax (before any backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeated test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Minimal yacs stub so the reference implementation at /root/reference can be
# imported as a parity oracle in tests (yacs itself is not installed here).
import sys  # noqa: E402
import types as _types  # noqa: E402

if "yacs" not in sys.modules:
    _yacs = _types.ModuleType("yacs")
    _yacs_config = _types.ModuleType("yacs.config")

    class _CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _yacs_config.CfgNode = _CfgNode
    _yacs.config = _yacs_config
    sys.modules["yacs"] = _yacs
    sys.modules["yacs.config"] = _yacs_config

# Minimal torchvision stub (only what reference utils/depth.py touches).
if "torchvision" not in sys.modules:
    try:
        import torchvision  # noqa: F401
    except ImportError:
        _tv = _types.ModuleType("torchvision")
        _tv_t = _types.ModuleType("torchvision.transforms")
        _tv_t.ToPILImage = object
        _tv.transforms = _tv_t
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.transforms"] = _tv_t
