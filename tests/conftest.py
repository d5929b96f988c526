"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4).

NOTE: the sandbox exports JAX_PLATFORMS=axon (the TPU tunnel); overwriting the
env var alone is not enough once the plugin is on PYTHONPATH, so we also force
the platform through jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# no persistent compile cache under tests: CPU compiles are fast, and a
# cache shared with TPU-platform processes can poison either side (a
# cached executable from one backend aborts deserialization on the other)
os.environ["MEANT_TPU_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
