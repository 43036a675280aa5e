import os

# Multi-device CPU mesh for sharding tests + persistent compilation cache
# so the conv-heavy graphs compile once per machine.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Belt and braces: a pytest plugin may import jax before this conftest
# runs, in which case the env var alone is ignored.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec  # noqa: E402


@pytest.fixture(scope="session")
def tiny_spec():
    return ArchSpec(channels=(2, 4, 8, 16, 32))


@pytest.fixture(scope="session")
def tiny_batch():
    rng = np.random.default_rng(0)
    B, Y, X, Z = 1, 8, 32, 64
    return {
        "image": rng.normal(size=(B, 1, Y, Z, X)).astype(np.float32),
        "slo": rng.normal(size=(B, 1, 80, 1, 32)).astype(np.float32),
        "mask": (rng.random((B, 1, Y, 1, X)) > 0.7).astype(np.float32),
        "spacing": np.tile(np.array([0.12, 0.004, 0.012]), (B, 1)),
    }


@pytest.fixture(scope="session")
def synthetic_hrf(tmp_path_factory):
    from multimodal_fusion_fpn_tpu.data.synthetic import make_synthetic_hrf
    root = tmp_path_factory.mktemp("hrf")
    return make_synthetic_hrf(str(root), n_patients=4, d=16, h=64, w=32,
                              enface_h=80, enface_w=32, seed=0)
