"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Must run before any ``jax`` import (SURVEY.md §4: the standard JAX way to
test multi-device sharding without TPU hardware).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already have been imported by the environment's sitecustomize
# (which pins the TPU platform); override via the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

REFERENCE_PATH = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_PATH)


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
