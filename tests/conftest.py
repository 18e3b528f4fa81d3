"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere; the real-TPU path is exercised by bench.py / the driver."""

import os

# Hard-override: the ambient environment points JAX_PLATFORMS at the real TPU
# tunnel and a sitecustomize pre-imports jax, so plain env vars are too late.
# The backend initializes lazily — jax.config.update still wins as long as no
# op has run yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_SCENES = pathlib.Path("/root/reference/Scenes")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (interpret-mode kernel runs, "
             "BVH train steps); default path stays under ~5 minutes")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test (interpret-mode Pallas kernels, BVH "
        "train steps); skipped unless --runslow or RTC_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RTC_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (or RTC_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def bounce_txt() -> str:
    return (REFERENCE_SCENES / "bounce.txt").read_text(encoding="utf-8-sig")


@pytest.fixture(scope="session")
def die_txt() -> str:
    return (REFERENCE_SCENES / "die.txt").read_text(encoding="utf-8-sig")
