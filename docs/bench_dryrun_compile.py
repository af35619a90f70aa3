"""Measure the multichip dryrun's compile wall time (the driver artifact).

MULTICHIP_r02 failed rc=124: the 2D (data x space) phase compile blew the
driver's budget on a cold cache. This probe times each phase cold so the
fix (pack_mode="two_step" under a 'space' axis, engine/train.py
_resolve_pack_mode, + persistent compile cache in __graft_entry__) stays
measured.

Run:  python docs/bench_dryrun_compile.py [cache_dir]
(uses a throwaway cache dir by default == always cold)
"""

import json
import os
import sys
import tempfile
import time

cache = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="pn_cold_")
os.environ["PN_COMPILE_CACHE"] = cache
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

t0 = time.time()
import __graft_entry__  # noqa: E402

__graft_entry__.dryrun_multichip(8)
total = time.time() - t0
print(json.dumps({"metric": "dryrun_multichip_cold_wall", "value": round(total, 1),
                  "unit": "s", "cache": cache}))
