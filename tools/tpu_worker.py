"""Persistent TPU job worker (dev tool).

The axon TPU tunnel costs minutes per process to dial; this worker pays that once and then
executes submitted python job files in-process. Submit: write <name>.py into the jobs dir;
the worker execs it (globals persist between jobs — cache params there), captures stdout +
exceptions into <name>.out, then renames the job to <name>.done.
"""

import io
import os
import sys
import time
import traceback

JOBS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import gc  # noqa: E402

import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)

shared: dict = {"jax": jax}
BASE_KEYS = set(shared)

while True:
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(1.0)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    out_path = path[:-3] + ".out"
    with open(path) as f:
        src = f.read()
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    # re-import repo code fresh each job (the repo evolves while the worker lives)
    for mod in [m for m in sys.modules if m.startswith("goal_force_tpu")]:
        del sys.modules[mod]
    try:
        exec(compile(src, name, "exec"), shared)
        status = "OK"
    except Exception:
        traceback.print_exc(file=buf)
        status = "ERROR"
    finally:
        sys.stdout = old
        # Free device memory: drop everything a job defined (except persist_* names)
        # and clear compiled-executable caches holding constants.
        for k in list(shared):
            if k not in BASE_KEYS and not k.startswith("persist_"):
                del shared[k]
        gc.collect()
        jax.clear_caches()
    with open(out_path, "w") as f:
        f.write(f"[{status}]\n" + buf.getvalue())
    os.rename(path, path[:-3] + ".done")
    print(f"job {name}: {status}", flush=True)
