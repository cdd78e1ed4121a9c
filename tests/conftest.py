"""Test fixture: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests use XLA's
host-platform device-count override (the standard JAX pattern for testing
pjit/shard_map layouts without real chips).
"""

import os

# The sandbox's sitecustomize force-registers the axon TPU plugin and sets
# JAX_PLATFORMS=axon at interpreter start (before conftest), so the env var
# alone is ignored -- jax.config.update after import is what actually works.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
CORNELL = REPO.parent / "reference" / "Assets" / "CornellBox" / "cornell.gltf"
CORNELL_EMISSIVE = (
    REPO.parent / "reference" / "Assets" / "CornellBox" / "cornell_emissive.gltf"
)


# Test tiers (reference CI discipline, .github/workflows/build.yml): the
# fast tier (`-m "not slow"`) is the per-commit signal (~unit tests +
# oracles + goldens-lite); the slow tier adds full-frame renders, the
# multi-device mesh suite, and statistical convergence tests. Run all of
# tests/ for the nightly-style full pass.
_SLOW_MODULES = {
    "test_banded_frame",
    "test_cutout",
    "test_golden",
    "test_megakernel",
    "test_parallel",
    "test_pathtracer",
    "test_restir_di",
    "test_restir_gi",
    "test_restir_pt",
    "test_sky_integration",
    "test_skydi",
    "test_stream",
    "test_temporal_motion",
    "test_texturing",
    "test_transmission",
    "test_volumetrics",
}


# individually-heavy tests in otherwise-fast modules (>35s on the CPU
# mesh): statistical multi-frame renders and interpret-mode megakernels
_SLOW_TESTS = {
    "test_taau_converges_to_full_res",
    "test_smb_restir_gi_frame",
    "test_smb_megakernel",
    "test_smb_kill_none_vs_all",
    "test_regularization_megakernel",
    "test_megakernel_nee_nondefault_scale",
    "test_motion_vectors_and_temporal",
    "test_pairwise_matches_unreused_mean",
    "test_lvg_candidates_match_baseline",
    "test_checkpoint_roundtrip",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _SLOW_MODULES
                or item.originalname in _SLOW_TESTS
                or item.name in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="session")
def cornell_cpu():
    from zetaray_tpu.scene import load_scene

    if not CORNELL_EMISSIVE.exists():
        pytest.skip("Cornell asset not available")
    return load_scene(CORNELL_EMISSIVE)


@pytest.fixture(scope="session")
def cornell_dev(cornell_cpu):
    from zetaray_tpu.scene import upload_scene

    return upload_scene(cornell_cpu)
