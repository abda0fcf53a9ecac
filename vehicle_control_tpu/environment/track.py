"""Closed-track geometry engine.

The reference (vehicle_control/environment/track.py:83-361) builds scipy +
CasADi spline interpolants and evaluates them through the CasADi VM.  Here the
pipeline is split TPU-first:

* **Host-side preprocessing** (NumPy/SciPy, runs once): corner list -> dense
  waypoints -> moving-average smoothing -> closure -> cubic spline through the
  waypoints -> arclength reparameterisation -> uniformly-sampled cubic spline
  *coefficient tables* for x(s), y(s) and curvature k(s).
* **Device-side evaluation** (:class:`TrackData`, a registered pytree of plain
  arrays): k(s), orientation(s), rel2glob(s,ey,epsi) are gather + Horner
  polynomial evaluations - fully ``jit``/``vmap``/``shard_map`` friendly, with
  ``s mod length`` for successive laps.

Pipeline parity notes (so curvature matches the reference numerically):
  - waypoint densification/smoothing mirrors track.py:254-296;
  - waypoint list construction drops the final closing point and derives psi
    from the difference-ahead vector (track.py:298-330);
  - the spline is an interpolating cubic over integer waypoint index
    (track.py:206-229), track length is the trapezoid integral of |dr/dsigma|
    over the integer grid (track.py:237-243);
  - curvature k = |x'y'' - x''y'| / (x'^2+y'^2)^1.5 (track.py:109-119) is
    invariant to the sigma->s reparameterisation so it is computed directly in
    sigma;
  - k(s) is precomputed every ds=0.05 m and refit as a cubic spline
    (track.py:156-167).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import trapezoid
from scipy.interpolate import CubicSpline, InterpolatedUnivariateSpline

from vehicle_control_tpu.utils.math import wrap

CURVATURE_DS = 0.05  # curvature table sampling step (reference: track.py:157)


# ---------------------------------------------------------------------------
# Device-side representation
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrackData:
    """Device-resident track geometry: uniform-knot cubic spline tables.

    Coefficient arrays have shape (n_segments, 4), ascending powers, local
    parameter t = s - i*ds in [0, ds) — row-major so one gather fetches all
    four coefficients of a segment (4x fewer gathers on the solver hot path).
    """

    length: jnp.ndarray  # scalar
    ds: jnp.ndarray  # scalar knot spacing
    k_coeffs: jnp.ndarray  # (n, 4) curvature spline
    x_coeffs: jnp.ndarray  # (n, 4) centerline x(s)
    y_coeffs: jnp.ndarray  # (n, 4) centerline y(s)
    width: jnp.ndarray  # scalar track width
    obstacles: jnp.ndarray  # (n_obs, 5): cx, cy, s, ey, radius
    occ_grid: jnp.ndarray  # (n_s, n_ey) binary occupancy over (s, ey)
    occ_ds: jnp.ndarray  # scalar s spacing of occ_grid
    occ_ey0: jnp.ndarray  # scalar first ey sample
    occ_dey: jnp.ndarray  # scalar ey spacing


def _horner(coeffs, idx, t):
    c = jnp.take(coeffs, idx, axis=0)  # (..., 4): one gather per lookup
    return ((c[..., 3] * t + c[..., 2]) * t + c[..., 1]) * t + c[..., 0]


def _horner_d1(coeffs, idx, t):
    c = jnp.take(coeffs, idx, axis=0)
    return (3.0 * c[..., 3] * t + 2.0 * c[..., 2]) * t + c[..., 1]


def _locate(track: TrackData, s):
    """Wrap s into [0, length) and find the spline segment + local offset."""
    s = jnp.asarray(s)
    s_mod = jnp.mod(s, track.length)
    n_seg = track.k_coeffs.shape[0]
    idx = jnp.clip(jnp.floor(s_mod / track.ds).astype(jnp.int32), 0, n_seg - 1)
    t = s_mod - idx.astype(s_mod.dtype) * track.ds
    return idx, t


def curvature(track: TrackData, s):
    """k(s), the precomputed-curvature spline (reference: track.py:156-167)."""
    idx, t = _locate(track, s)
    return _horner(track.k_coeffs, idx, t)


def curvature_derivative(track: TrackData, s):
    """dk/ds (reference: track.py:167)."""
    idx, t = _locate(track, s)
    return _horner_d1(track.k_coeffs, idx, t)


def position(track: TrackData, s):
    """Centerline (x, y) at arclength s."""
    idx, t = _locate(track, s)
    return _horner(track.x_coeffs, idx, t), _horner(track.y_coeffs, idx, t)


def orientation(track: TrackData, s):
    """Tangent heading at arclength s (reference: track.py:121-129)."""
    idx, t = _locate(track, s)
    dx = _horner_d1(track.x_coeffs, idx, t)
    dy = _horner_d1(track.y_coeffs, idx, t)
    return jnp.arctan2(dy, dx)


def rel2glob(track: TrackData, s, ey, epsi):
    """Frenet (s, ey, epsi) -> global (x, y, psi) (reference: track.py:102-107)."""
    psi_c = orientation(track, s)
    x, y = position(track, s)
    x = x - jnp.sin(psi_c) * ey
    y = y + jnp.cos(psi_c) * ey
    return x, y, wrap(psi_c + epsi)


def occupancy(track: TrackData, s, ey):
    """Bilinear obstacle-occupancy lookup on device (the reference's casadi
    interpolant over the precomputed grid, track.py:151-153)."""
    s = jnp.mod(jnp.asarray(s), track.length)
    ey = jnp.asarray(ey)
    n_s, n_ey = track.occ_grid.shape
    fi = jnp.clip(s / track.occ_ds, 0.0, n_s - 1.001)
    fj = jnp.clip((ey - track.occ_ey0) / track.occ_dey, 0.0, n_ey - 1.001)
    i = jnp.floor(fi).astype(jnp.int32)
    j = jnp.floor(fj).astype(jnp.int32)
    ti = fi - i
    tj = fj - j
    g = track.occ_grid
    return (
        g[i, j] * (1 - ti) * (1 - tj)
        + g[i + 1, j] * ti * (1 - tj)
        + g[i, j + 1] * (1 - ti) * tj
        + g[i + 1, j + 1] * ti * tj
    )


def obstacle_distances(track: TrackData, s, ey):
    """Euclidean (s, ey)-plane distance to each obstacle center.

    Matches the distance the MPC costs use (reference: cascaded_mpc.py:175).
    Returns shape (..., n_obs).
    """
    s = jnp.asarray(s)[..., None]
    ey = jnp.asarray(ey)[..., None]
    obs_s = track.obstacles[:, 2]
    obs_ey = track.obstacles[:, 3]
    return jnp.sqrt((s - obs_s) ** 2 + (ey - obs_ey) ** 2)


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------


class Waypoint:
    """(x, y, psi) with lane bounds (reference: track.py:15-52)."""

    def __init__(self, x, y, psi):
        self.x = x
        self.y = y
        self.psi = psi
        self.lb = None
        self.rb = None

    def __iter__(self):
        yield self.x
        yield self.y
        yield self.psi

    def __sub__(self, other):
        return ((self.x - other.x) ** 2 + (self.y - other.y) ** 2) ** 0.5


class Obstacle:
    """Circular obstacle placed by (s, ey, radius) (reference: track.py:55-80)."""

    def __init__(self, cx, cy, s, ey, radius):
        self.cx = cx
        self.cy = cy
        self.s = s
        self.ey = ey
        self.radius = radius

    def __repr__(self) -> str:  # pragma: no cover
        return f"Obstacle(cx={self.cx}, cy={self.cy}, radius={self.radius})"


class Track:
    """Host-side track: preprocessing + a device-resident :class:`TrackData`.

    Accepts the reference YAML schema (config/environment/*.yaml): ``name``,
    ``corners``, ``obstacle_data``, ``resolution``, ``smoothing``, ``width``.
    """

    def __init__(self, config):
        self.name = config["name"]
        self.width = float(config["width"])
        self.resolution = float(config["resolution"])
        self.smoothing = int(config["smoothing"])
        wp_x, wp_y = self._construct_path(config["corners"])
        self.waypoints: List[Waypoint] = self._construct_waypoints(wp_x, wp_y)
        self.n_waypoints = len(self.waypoints)

        self._construct_spline()
        self._precompute_curvatures()
        self._divide_track()
        self.obstacles: List[Obstacle] = self._construct_obstacles(
            config.get("obstacle_data") or []
        )

        obs_arr = np.array(
            [[o.cx, o.cy, o.s, o.ey, o.radius] for o in self.obstacles],
            dtype=np.float64,
        ).reshape(-1, 5)
        self.data = TrackData(
            length=jnp.asarray(self.length),
            ds=jnp.asarray(CURVATURE_DS),
            k_coeffs=jnp.asarray(self._k_coeffs),
            x_coeffs=jnp.asarray(self._x_coeffs),
            y_coeffs=jnp.asarray(self._y_coeffs),
            width=jnp.asarray(self.width),
            obstacles=jnp.asarray(obs_arr),
            occ_grid=jnp.asarray(self._occ_grid),
            occ_ds=jnp.asarray(self._occ_s[1] - self._occ_s[0]),
            occ_ey0=jnp.asarray(self._occ_ey[0]),
            occ_dey=jnp.asarray(self._occ_ey[1] - self._occ_ey[0]),
        )

    # -- path construction (reference: track.py:254-296) --------------------

    def _construct_path(self, corners):
        wp_x, wp_y = [], []
        for i in range(len(corners) - 1):
            start, end = corners[i], corners[i + 1]
            distance = float(np.hypot(end[0] - start[0], end[1] - start[1]))
            n_wp = int(distance / self.resolution)
            wp_x.extend(np.linspace(start[0], end[0], n_wp, endpoint=False))
            wp_y.extend(np.linspace(start[1], end[1], n_wp, endpoint=False))
        wp_x = np.asarray(wp_x)
        wp_y = np.asarray(wp_y)

        # moving-average smoothing, end points untouched (track.py:271-286)
        n = len(wp_x)
        sm = self.smoothing
        xs = np.array(wp_x)
        ys = np.array(wp_y)
        for i in range(n):
            if sm <= i <= n - sm - 2:
                xs[i] = np.mean(wp_x[i - sm : i + sm + 1])
                ys[i] = np.mean(wp_y[i - sm : i + sm + 1])
        # close the circuit (track.py:289-290)
        xs = np.append(xs, xs[0])
        ys = np.append(ys, ys[0])
        return xs, ys

    def _construct_waypoints(self, wp_x, wp_y):
        # heading from the difference-ahead vector; drops the closing point
        # (reference: track.py:298-330)
        waypoints = []
        for i in range(len(wp_x) - 1):
            dx = wp_x[i + 1] - wp_x[i]
            dy = wp_y[i + 1] - wp_y[i]
            wp = Waypoint(wp_x[i], wp_y[i], np.arctan2(dy, dx))
            self._set_bounds(wp)
            waypoints.append(wp)
        return waypoints

    def _set_bounds(self, wp: Waypoint):
        # (reference: track.py:332-340)
        orth = float(wrap(wp.psi + np.pi / 2))
        half = self.width / 2
        wp.lb = np.array([wp.x - np.cos(orth) * half, wp.y - np.sin(orth) * half])
        wp.rb = np.array([wp.x + np.cos(orth) * half, wp.y + np.sin(orth) * half])

    # -- spline + arclength (reference: track.py:206-252) -------------------

    def _construct_spline(self):
        xs = np.array([wp.x for wp in self.waypoints])
        ys = np.array([wp.y for wp in self.waypoints])
        sigma = np.arange(len(xs), dtype=np.float64)
        self._x_of_sigma = InterpolatedUnivariateSpline(sigma, xs, k=3, ext=3)
        self._y_of_sigma = InterpolatedUnivariateSpline(sigma, ys, k=3, ext=3)

        speed = np.sqrt(
            self._x_of_sigma.derivative(1)(sigma) ** 2
            + self._y_of_sigma.derivative(1)(sigma) ** 2
        )
        self.length = float(trapezoid(speed, sigma))

    def _sigma(self, s):
        # s in [0, length] -> waypoint-index parameter (track.py:246-247)
        return (np.asarray(s) / self.length) * self.n_waypoints

    def get_curvature_host(self, s):
        """Unsigned curvature from spline derivatives (track.py:109-119).

        Computed in sigma; the formula is reparameterisation-invariant.
        """
        sig = self._sigma(np.mod(s, self.length))
        dx = self._x_of_sigma.derivative(1)(sig)
        dy = self._y_of_sigma.derivative(1)(sig)
        ddx = self._x_of_sigma.derivative(2)(sig)
        ddy = self._y_of_sigma.derivative(2)(sig)
        return np.abs(dx * ddy - ddx * dy) / np.power(dx**2 + dy**2, 1.5)

    def get_orientation_host(self, s):
        sig = self._sigma(np.mod(s, self.length))
        dx = self._x_of_sigma.derivative(1)(sig)
        dy = self._y_of_sigma.derivative(1)(sig)
        return np.arctan2(dy, dx)

    def _precompute_curvatures(self):
        # sample every 0.05 m then refit a cubic (reference: track.py:156-167)
        s_values = np.arange(0.0, self.length - 0.1, CURVATURE_DS)
        k_values = self.get_curvature_host(s_values)
        x_values = self._x_of_sigma(self._sigma(s_values))
        y_values = self._y_of_sigma(self._sigma(s_values))
        self._k_coeffs = _uniform_cubic_coeffs(s_values, k_values)
        self._x_coeffs = _uniform_cubic_coeffs(s_values, x_values)
        self._y_coeffs = _uniform_cubic_coeffs(s_values, y_values)
        self._k_table_s = s_values
        self._k_table = k_values

    # -- segmentation (reference: track.py:169-204) --------------------------

    def _divide_track(self, eps: float = 1e-7):
        segments = []
        s_values = np.arange(0.0, self.length - 0.1, CURVATURE_DS)
        start = 0.0
        is_curve = False
        max_curv = 0.0
        for s, curv in zip(s_values, self._k_table):
            if abs(curv) > eps and not is_curve:
                if s - start > 1:
                    is_curve = True
                    segments.append([start, s, 0])
                    start = s
            if is_curve and curv > max_curv:
                max_curv = curv
            if abs(curv) < eps and is_curve:
                if s - start > 1:
                    is_curve = False
                    segments.append([start, s, float(max_curv)])
                    start = s
            if s >= self.length - 0.15:
                segments.append([start, s, False])
        self.segments = segments

    # -- obstacles (reference: track.py:131-154) ------------------------------

    def _construct_obstacles(self, obstacle_data):
        obstacles = []
        for s, ey, radius in obstacle_data:
            x, y, _ = self.rel2glob_host(s, ey, 0.0)
            obstacles.append(Obstacle(float(x), float(y), s, ey, radius))

        # 2D binary occupancy grid over (s, ey), linearly interpolated.
        s_values = np.arange(0.0, self.length - 0.1, 0.5)
        ey_values = np.arange(0.0, self.width, 0.01) - self.width / 2
        S, EY = np.meshgrid(s_values, ey_values, indexing="ij")
        psi_c = self.get_orientation_host(S.ravel()).reshape(S.shape)
        X = self._x_of_sigma(self._sigma(S.ravel())).reshape(S.shape) - np.sin(psi_c) * EY
        Y = self._y_of_sigma(self._sigma(S.ravel())).reshape(S.shape) + np.cos(psi_c) * EY
        Z = np.zeros_like(S)
        for obs in obstacles:
            # note: the reference compares distance <= (radius+1)**2
            # (track.py:149); we keep unsquared radius+1 (the evident intent)
            Z += (np.sqrt((X - obs.cx) ** 2 + (Y - obs.cy) ** 2) <= obs.radius + 1).astype(float)
        self._occ_s = s_values
        self._occ_ey = ey_values
        self._occ_grid = Z
        return obstacles

    def occupancy(self, s, ey):
        """Bilinear occupancy lookup (reference: track.py:151-153)."""
        return _bilinear(self._occ_s, self._occ_ey, self._occ_grid, s, ey)

    # -- host conveniences -----------------------------------------------------

    def rel2glob_host(self, s, ey, epsi):
        psi_c = self.get_orientation_host(s)
        x = self._x_of_sigma(self._sigma(np.mod(s, self.length))) - np.sin(psi_c) * ey
        y = self._y_of_sigma(self._sigma(np.mod(s, self.length))) + np.cos(psi_c) * ey
        return x, y, np.asarray(wrap(psi_c + epsi))

    def k(self, s):
        """Device-spline curvature, host-callable (reference API: track.k)."""
        return np.asarray(curvature(self.data, jnp.asarray(s, dtype=jnp.float64)))


def _uniform_cubic_coeffs(s_values: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Fit an interpolating cubic spline on a uniform grid; return (4, n-1)
    ascending-power coefficients in the local parameter t = s - s_i."""
    spline = CubicSpline(s_values, values, bc_type="not-a-knot")
    # scipy stores descending powers: c[m, i] * t**(3-m); row-major ascending
    c = spline.c
    return np.stack([c[3], c[2], c[1], c[0]], axis=1)


def _bilinear(xs, ys, grid, x, y):
    x = np.clip(x, xs[0], xs[-1])
    y = np.clip(y, ys[0], ys[-1])
    i = np.clip(np.searchsorted(xs, x) - 1, 0, len(xs) - 2)
    j = np.clip(np.searchsorted(ys, y) - 1, 0, len(ys) - 2)
    tx = (x - xs[i]) / (xs[i + 1] - xs[i])
    ty = (y - ys[j]) / (ys[j + 1] - ys[j])
    return (
        grid[i, j] * (1 - tx) * (1 - ty)
        + grid[i + 1, j] * tx * (1 - ty)
        + grid[i, j + 1] * (1 - tx) * ty
        + grid[i + 1, j + 1] * tx * ty
    )
