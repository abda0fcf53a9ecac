import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY §4: multi-chip test layer).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself ahead of JAX_PLATFORMS; override
# explicitly so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# f64 on CPU for parity tests against the reference's float64 artifacts.
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_available():
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def ippodromo_track():
    from vehicle_control_tpu.utils.config import load_config, project_root
    from vehicle_control_tpu.environment.track import Track

    cfg = load_config(os.path.join(project_root(), "configs/environment/ippodromo.yaml"))
    return Track(cfg)


@pytest.fixture(scope="session")
def shoe_track():
    from vehicle_control_tpu.utils.config import load_config, project_root
    from vehicle_control_tpu.environment.track import Track

    cfg = load_config(os.path.join(project_root(), "configs/environment/shoe.yaml"))
    return Track(cfg)
