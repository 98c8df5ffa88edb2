"""Test environment: run JAX on CPU with 8 virtual devices so sharding paths are exercised
without TPU hardware (something the reference cannot do — SURVEY.md §4)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize hook registers the TPU backend and forces jax_platforms to
# "axon,cpu" regardless of the env var; override via jax.config before any backend init
# (dialing the TPU tunnel takes ~2 min — tests must stay on CPU).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_module(relpath: str, name: str):
    """Load a reference source file directly, bypassing the package __init__ (which pulls
    CUDA-era deps like modelscope). Read-only study of the reference's behavior."""
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
