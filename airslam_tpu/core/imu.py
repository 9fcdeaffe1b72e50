"""IMU preintegration (Forster-style) as a jit-able ``lax.scan``.

Replaces ``src/imu.cc`` / ``include/imu.h``. The per-step update reproduces
``Preinteration::Propagate`` (src/imu.cc:157-210): order of operations matters
(dP/dV updated with the *previous* dR, Jacobians updated before dR), and the
covariance recursion uses the same A/B matrices. The midpoint interpolation of
measurement batches reproduces ``AddBatchData`` (src/imu.cc:218-248).

TPU-native formulation: measurements are padded to a static length and folded
with ``lax.scan``; padded steps carry dt=0 and a mask so they are exact no-ops
(including the bias random-walk covariance accumulation, which the reference
adds once per real measurement at src/imu.cc:203). This makes the whole
preintegration embeddable in a fused tracking graph with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airslam_tpu.core import lie


class PreintState(NamedTuple):
    """Preintegrated deltas + bias Jacobians + 15x15 covariance."""

    dT: jax.Array  # ()
    dR: jax.Array  # (3, 3)
    dV: jax.Array  # (3,)
    dP: jax.Array  # (3,)
    JRg: jax.Array  # (3, 3)
    JVg: jax.Array  # (3, 3)
    JVa: jax.Array  # (3, 3)
    JPg: jax.Array  # (3, 3)
    JPa: jax.Array  # (3, 3)
    cov: jax.Array  # (15, 15)


def init_state(dtype=jnp.float64) -> PreintState:
    z3 = jnp.zeros((3,), dtype)
    z33 = jnp.zeros((3, 3), dtype)
    return PreintState(
        dT=jnp.zeros((), dtype),
        dR=jnp.eye(3, dtype=dtype),
        dV=z3,
        dP=z3,
        JRg=z33,
        JVg=z33,
        JVa=z33,
        JPg=z33,
        JPa=z33,
        cov=jnp.zeros((15, 15), dtype),
    )


def propagate_step(
    state: PreintState,
    dt: jax.Array,
    acc_m: jax.Array,
    gyr_m: jax.Array,
    bg: jax.Array,
    ba: jax.Array,
    noise_diag: jax.Array,  # (6,) [gyr_noise², ×3, acc_noise², ×3]
    walk_diag: jax.Array,  # (6,)
    valid: jax.Array,  # () bool — padded steps are no-ops
) -> PreintState:
    """One measurement update; mirrors src/imu.cc:157-210."""
    dtype = state.dR.dtype
    acc = acc_m - ba
    gyr = gyr_m - bg

    dP = state.dP + state.dV * dt + 0.5 * (state.dR @ acc) * dt * dt
    dV = state.dV + (state.dR @ acc) * dt

    acc_hat = lie.hat(acc)
    eye3 = jnp.eye(3, dtype=dtype)

    a = jnp.zeros((9, 9), dtype)
    a = a.at[0:3, 0:3].set(eye3)  # overwritten below by delta_R.T
    a = a.at[3:6, 3:6].set(eye3)
    a = a.at[6:9, 6:9].set(eye3)
    a = a.at[3:6, 0:3].set(-state.dR * dt @ acc_hat)
    a = a.at[6:9, 0:3].set(-0.5 * state.dR * dt * dt @ acc_hat)
    a = a.at[6:9, 3:6].set(eye3 * dt)

    b = jnp.zeros((9, 6), dtype)

    JPa = state.JPa + state.JVa * dt - 0.5 * state.dR * dt * dt
    JPg = state.JPg + state.JVg * dt - 0.5 * (state.dR * dt * dt) @ acc_hat @ state.JRg
    JVa = state.JVa - state.dR * dt
    JVg = state.JVg - (state.dR * dt) @ acc_hat @ state.JRg

    rv = gyr * dt
    delta_r = lie.so3_exp(rv)
    jr = lie.so3_right_jacobian(rv)
    dR = lie.normalize_rotation(state.dR @ delta_r)

    a = a.at[0:3, 0:3].set(delta_r.T)
    b = b.at[0:3, 0:3].set(jr * dt)
    b = b.at[3:6, 3:6].set(state.dR * dt)
    b = b.at[6:9, 3:6].set(0.5 * state.dR * dt * dt)

    cov99 = a @ state.cov[0:9, 0:9] @ a.T + b @ jnp.diag(noise_diag) @ b.T
    cov = state.cov.at[0:9, 0:9].set(cov99)
    cov = cov.at[9:15, 9:15].add(jnp.diag(walk_diag))

    JRg = delta_r.T @ state.JRg - jr * dt

    new = PreintState(
        dT=state.dT + dt,
        dR=dR,
        dV=dV,
        dP=dP,
        JRg=JRg,
        JVg=JVg,
        JVa=JVa,
        JPg=JPg,
        JPa=JPa,
        cov=cov,
    )
    return jax.tree_util.tree_map(lambda n, o: jnp.where(valid, n, o), new, state)


def preintegrate(
    dts: jax.Array,  # (N,) padded with zeros
    accs: jax.Array,  # (N, 3)
    gyrs: jax.Array,  # (N, 3)
    bg: jax.Array,
    ba: jax.Array,
    noise_diag: jax.Array,
    walk_diag: jax.Array,
    init: Optional[PreintState] = None,
) -> PreintState:
    """Fold all measurements with lax.scan (static N; padded dt == 0 steps are no-ops)."""
    if init is None:
        init = init_state(dtype=accs.dtype)

    def body(state, xs):
        dt, acc, gyr = xs
        return (
            propagate_step(state, dt, acc, gyr, bg, ba, noise_diag, walk_diag, dt > 0),
            None,
        )

    state, _ = jax.lax.scan(body, init, (dts, accs, gyrs))
    return state


# -- bias-corrected getters (src/imu.cc:250-281) ----------------------------


def delta_rotation(state: PreintState, bg_ref: jax.Array, bg_new: jax.Array) -> jax.Array:
    ddr = lie.so3_exp(state.JRg @ (bg_new - bg_ref))
    return lie.normalize_rotation(state.dR @ ddr)


def delta_velocity(state, bg_ref, ba_ref, bg_new, ba_new):
    return state.dV + state.JVg @ (bg_new - bg_ref) + state.JVa @ (ba_new - ba_ref)


def delta_position(state, bg_ref, ba_ref, bg_new, ba_new):
    return state.dP + state.JPg @ (bg_new - bg_ref) + state.JPa @ (ba_new - ba_ref)


def predict(state: PreintState, Rwb0, twb0, vwb0, g_value: float):
    """IMU state propagation: src/imu.cc:299-313 (``Preinteration::Predict``)."""
    g = jnp.asarray([0.0, 0.0, -g_value], dtype=twb0.dtype)
    dT = state.dT
    Rwb1 = lie.normalize_rotation(Rwb0 @ state.dR)
    twb1 = twb0 + vwb0 * dT + 0.5 * dT * dT * g + Rwb0 @ state.dP
    vwb1 = vwb0 + dT * g + Rwb0 @ state.dV
    return Rwb1, twb1, vwb1


# ---------------------------------------------------------------------------
# Host-side measurement accumulator (mirrors Preinteration's list-keeping)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ImuData:
    timestamp: float
    gyr: np.ndarray
    acc: np.ndarray


def midpoint_batch(imu_data, t0: float, t1: float):
    """Convert raw samples spanning [t0, t1] into (dt, acc, gyr) midpoint rows.

    Reproduces the interpolation cases of ``AddBatchData`` (src/imu.cc:218-248).
    Returns float64 numpy arrays of shape (M,), (M, 3), (M, 3).
    """
    dts, accs, gyrs = [], [], []
    n = len(imu_data)
    for i in range(n - 1):
        a, b = imu_data[i], imu_data[i + 1]
        if b.timestamp < t0:
            continue
        if a.timestamp > t1:
            break
        if a.timestamp < t0:
            mid_t = 0.5 * (t0 + b.timestamp)
            dt = b.timestamp - t0
        elif b.timestamp > t1:
            mid_t = 0.5 * (t1 + a.timestamp)
            dt = t1 - a.timestamp
        else:
            mid_t = 0.5 * (a.timestamp + b.timestamp)
            dt = b.timestamp - a.timestamp
        span = b.timestamp - a.timestamp
        w1 = (b.timestamp - mid_t) / span
        w2 = (mid_t - a.timestamp) / span
        gyrs.append(w1 * a.gyr + w2 * b.gyr)
        accs.append(w1 * a.acc + w2 * b.acc)
        dts.append(dt)
    if not dts:
        return (
            np.zeros((0,), np.float64),
            np.zeros((0, 3), np.float64),
            np.zeros((0, 3), np.float64),
        )
    return np.asarray(dts), np.asarray(accs), np.asarray(gyrs)


class Preintegration:
    """Host accumulator with the reference's public surface (imu.h:47-88).

    Keeps raw (dt, acc, gyr) rows for repropagation on bias reset; the actual
    integration runs through the jitted scan above (padded to 2^k buckets so
    XLA compiles a handful of program shapes).
    """

    def __init__(self, noise=(0.0,) * 4, dtype=np.float64):
        # noise = (gyr_noise, acc_noise, gyr_walk, acc_walk), already √rate-scaled
        self.dtype = dtype
        gn, an, gw, aw = noise
        self.noise_diag = np.array([gn * gn] * 3 + [an * an] * 3, dtype)
        self.walk_diag = np.array([gw * gw] * 3 + [aw * aw] * 3, dtype)
        self.bg = np.zeros(3, dtype)
        self.ba = np.zeros(3, dtype)
        self.dbg = np.zeros(3, dtype)
        self.dba = np.zeros(3, dtype)
        self.start_time = -1.0
        self.end_time = -1.0
        self._rows_dt = []
        self._rows_acc = []
        self._rows_gyr = []
        self._state: Optional[PreintState] = None

    # -- measurement ingestion ---------------------------------------------

    def add_batch(self, imu_data, t0: float, t1: float):
        if len(imu_data) == 0:
            return
        self.start_time = t0 if self.start_time < 0 else self.start_time
        self.end_time = t1
        dts, accs, gyrs = midpoint_batch(imu_data, t0, t1)
        self._rows_dt.extend(dts.tolist())
        self._rows_acc.extend(np.asarray(accs).reshape(-1, 3))
        self._rows_gyr.extend(np.asarray(gyrs).reshape(-1, 3))
        self._state = None  # lazy recompute

    def valid(self) -> bool:
        return self.start_time >= 0 and self.end_time > self.start_time and len(self._rows_dt) > 0

    def reset(self):
        self.__init__(
            noise=(
                float(np.sqrt(self.noise_diag[0])),
                float(np.sqrt(self.noise_diag[3])),
                float(np.sqrt(self.walk_diag[0])),
                float(np.sqrt(self.walk_diag[3])),
            ),
            dtype=self.dtype,
        )

    def set_bias(self, bg, ba):
        """SetBias + Repropagate (src/imu.cc:145-155)."""
        self.bg = np.asarray(bg, self.dtype)
        self.ba = np.asarray(ba, self.dtype)
        self.dbg = np.zeros(3, self.dtype)
        self.dba = np.zeros(3, self.dtype)
        self._state = None

    def update_bias(self, bg_new, ba_new):
        """Linearized bias correction without repropagation (src/imu.cc:151-155)."""
        self.dbg = np.asarray(bg_new, self.dtype) - self.bg
        self.dba = np.asarray(ba_new, self.dtype) - self.ba

    # -- computation --------------------------------------------------------

    @staticmethod
    def _padded_len(n: int) -> int:
        p = 8
        while p < n:
            p *= 2
        return p

    @property
    def state(self) -> PreintState:
        if self._state is None:
            n = len(self._rows_dt)
            p = self._padded_len(max(n, 1))
            dts = np.zeros((p,), self.dtype)
            accs = np.zeros((p, 3), self.dtype)
            gyrs = np.zeros((p, 3), self.dtype)
            if n:
                dts[:n] = self._rows_dt
                accs[:n] = np.stack(self._rows_acc)
                gyrs[:n] = np.stack(self._rows_gyr)
            self._state = _jit_preintegrate(
                jnp.asarray(dts),
                jnp.asarray(accs),
                jnp.asarray(gyrs),
                jnp.asarray(self.bg),
                jnp.asarray(self.ba),
                jnp.asarray(self.noise_diag),
                jnp.asarray(self.walk_diag),
            )
        return self._state

    @property
    def dT(self) -> float:
        return float(self.state.dT)

    def updated_delta(self):
        """(dR, dV, dP) at the linearized updated bias."""
        st = self.state
        bg_new = jnp.asarray(self.bg + self.dbg)
        ba_new = jnp.asarray(self.ba + self.dba)
        bg = jnp.asarray(self.bg)
        ba = jnp.asarray(self.ba)
        return (
            np.asarray(delta_rotation(st, bg, bg_new)),
            np.asarray(delta_velocity(st, bg, ba, bg_new, ba_new)),
            np.asarray(delta_position(st, bg, ba, bg_new, ba_new)),
        )

    def predict(self, Twb0: np.ndarray, vwb0: np.ndarray, g_value: float):
        """Twb0 (4,4), vwb0 (3,) -> (Twb1, vwb1)."""
        if not self.valid():
            return Twb0.copy(), np.asarray(vwb0).copy()
        dR, dV, dP = self.updated_delta()
        Rwb0 = Twb0[:3, :3]
        twb0 = Twb0[:3, 3]
        g = np.array([0.0, 0.0, -g_value])
        dT = self.dT
        Twb1 = np.eye(4)
        Twb1[:3, :3] = np.asarray(lie.normalize_rotation(jnp.asarray(Rwb0 @ dR)))
        Twb1[:3, 3] = twb0 + vwb0 * dT + 0.5 * dT * dT * g + Rwb0 @ dP
        vwb1 = vwb0 + dT * g + Rwb0 @ dV
        return Twb1, vwb1


@jax.jit
def _jit_preintegrate(dts, accs, gyrs, bg, ba, noise_diag, walk_diag):
    return preintegrate(dts, accs, gyrs, bg, ba, noise_diag, walk_diag)
