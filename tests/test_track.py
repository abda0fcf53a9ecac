"""Track geometry tests: analytic validation + device/host spline agreement."""

import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.environment import track as track_mod
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.utils.config import ConfigDict


def _circle_config(radius=50.0, n_corners=128):
    # A polygon approximating a circle; with smoothing the track is ~circular.
    # Note: like the reference pipeline (track.py:271-286), the first/last
    # `smoothing` waypoints stay raw, so curvature near the seam s=0 is noisy;
    # analytic assertions sample the interior.
    th = np.linspace(0, 2 * np.pi, n_corners + 1)
    corners = [[radius * np.cos(t), radius * np.sin(t)] for t in th]
    return ConfigDict(
        name="circle",
        corners=corners,
        obstacle_data=[[10.0, 0.0, 1.0]],
        resolution=0.1,
        smoothing=100,
        width=9,
    )


@pytest.fixture(scope="module")
def circle_track():
    return Track(_circle_config())


def test_circle_curvature(circle_track):
    """Curvature of a smoothed circular track must be ~1/R (unsigned,
    reference formula track.py:109-119)."""
    R_nominal = 50.0
    s = np.linspace(20.0, circle_track.length - 20.0, 200)
    k = circle_track.k(s)
    # smoothing shrinks the polygon slightly; the moving average also ripples
    # at the corner spacing, so bound the mean tightly and the ripple loosely
    assert np.all(k > 0.5 / R_nominal) and np.all(k < 2.0 / R_nominal)
    assert abs(1.0 / np.mean(k) - R_nominal) / R_nominal < 0.05


def test_circle_length(circle_track):
    R_eff = 1.0 / np.mean(circle_track.k(np.linspace(20, circle_track.length - 20, 100)))
    assert abs(circle_track.length - 2 * np.pi * R_eff) / circle_track.length < 0.05


def test_device_spline_matches_host(circle_track):
    # The device-side k(s) interpolates the 0.05 m table (like the reference's
    # bspline refit, track.py:156-167); exact agreement holds at the knots.
    s = np.arange(0.0, circle_track.length - 0.2, 0.05)[::7]
    k_host = circle_track.get_curvature_host(s)
    k_dev = np.asarray(track_mod.curvature(circle_track.data, jnp.asarray(s)))
    np.testing.assert_allclose(k_dev, k_host, atol=1e-9)


def test_position_orientation_consistency(circle_track):
    """Tangent from spline derivative must match finite differences."""
    s = np.linspace(1.0, circle_track.length - 1.0, 50)
    eps = 1e-4
    x0, y0 = track_mod.position(circle_track.data, jnp.asarray(s))
    x1, y1 = track_mod.position(circle_track.data, jnp.asarray(s + eps))
    heading_fd = np.arctan2(np.asarray(y1 - y0), np.asarray(x1 - x0))
    heading = np.asarray(track_mod.orientation(circle_track.data, jnp.asarray(s)))
    err = np.abs(np.angle(np.exp(1j * (heading - heading_fd))))
    assert np.max(err) < 1e-3


def test_arclength_parametrization(circle_track):
    """|dr/ds| must be ~1 (s is approximately arclength).

    Like the reference (track.py:246-247), s is a *global* linear rescale of
    the waypoint index, so |dr/ds| is 1 only up to local waypoint-spacing
    variation (a fraction of a percent on a smooth track).
    """
    s = np.linspace(20.0, circle_track.length - 20.0, 200)
    eps = 1e-4
    x0, y0 = track_mod.position(circle_track.data, jnp.asarray(s))
    x1, y1 = track_mod.position(circle_track.data, jnp.asarray(s + eps))
    speed = np.hypot(np.asarray(x1 - x0), np.asarray(y1 - y0)) / eps
    np.testing.assert_allclose(speed, 1.0, atol=0.05)


def test_lap_wrap(circle_track):
    """k(s + L) == k(s): successive laps wrap (reference: track.py:111)."""
    s = np.array([3.0, 10.0, 42.0])
    L = circle_track.length
    np.testing.assert_allclose(
        circle_track.k(s), circle_track.k(s + L), rtol=0, atol=1e-9
    )


def test_rel2glob_roundtrip(circle_track):
    """rel2glob with ey=0 must land on the centerline; ey offsets move
    orthogonally by |ey| (reference: track.py:102-107)."""
    s = jnp.asarray([5.0, 20.0, 80.0])
    x0, y0, _ = track_mod.rel2glob(circle_track.data, s, jnp.zeros(3), jnp.zeros(3))
    xc, yc = track_mod.position(circle_track.data, s)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(xc), atol=1e-12)
    ey = jnp.asarray([1.5, -2.0, 0.5])
    x1, y1, _ = track_mod.rel2glob(circle_track.data, s, ey, jnp.zeros(3))
    d = np.hypot(np.asarray(x1 - x0), np.asarray(y1 - y0))
    np.testing.assert_allclose(d, np.abs(np.asarray(ey)), atol=1e-9)


def test_obstacles_placed(circle_track):
    assert circle_track.data.obstacles.shape == (1, 5)
    ox, oy = circle_track.data.obstacles[0, 0], circle_track.data.obstacles[0, 1]
    cx, cy = track_mod.position(circle_track.data, jnp.asarray(10.0))
    np.testing.assert_allclose(np.asarray(ox), np.asarray(cx), atol=1e-9)
    np.testing.assert_allclose(np.asarray(oy), np.asarray(cy), atol=1e-9)


def test_ippodromo_builds(ippodromo_track):
    t = ippodromo_track
    assert 300 < t.length < 340  # reference laps report length ~315-320 m
    assert len(t.obstacles) == 7
    assert len(t.segments) >= 4  # straights + curves
    k = t.k(np.linspace(0, t.length - 1, 500))
    # the k-table spline can undershoot slightly below 0 at ringing spots
    # (the reference's bspline refit does the same); bound magnitude instead
    assert np.min(k) > -0.05 and np.max(k) < 0.2 and np.mean(k) > 0


class TestOccupancy:
    def test_device_occupancy_matches_host(self, ippodromo_track):
        import numpy as np
        import jax.numpy as jnp
        from vehicle_control_tpu.environment.track import occupancy

        t = ippodromo_track
        rng = np.random.default_rng(3)
        s = rng.uniform(0, t.length - 1, 64)
        ey = rng.uniform(-t.width / 2 + 0.02, t.width / 2 - 0.02, 64)
        host = t.occupancy(s, ey)
        dev = np.asarray(occupancy(t.data, jnp.asarray(s), jnp.asarray(ey)))
        np.testing.assert_allclose(dev, host, atol=1e-9)

    def test_occupied_at_obstacle_center(self, ippodromo_track):
        import jax.numpy as jnp
        from vehicle_control_tpu.environment.track import occupancy

        t = ippodromo_track
        if not t.obstacles:
            return
        obs = t.obstacles[0]
        val = float(occupancy(t.data, jnp.asarray(obs.s), jnp.asarray(obs.ey)))
        assert val >= 1.0
