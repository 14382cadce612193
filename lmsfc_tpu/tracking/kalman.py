"""Constant-velocity Kalman filter for MOT (DeepSORT/JDE parameterization).

Host-side numpy — the tracker is inherently sequential and stateful, so it
stays off-device by design (SURVEY.md §7 hard part 3; ref jde.py:181-403).
State: [cx, cy, aspect, h, vcx, vcy, va, vh].
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.linalg

# 0.95 quantile of chi-square distribution, used for gating distance
CHI2INV95 = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877}


class KalmanFilter:
    def __init__(self):
        ndim, dt = 4, 1.0
        self._F = np.eye(2 * ndim)
        for i in range(ndim):
            self._F[i, ndim + i] = dt
        self._H = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        mean = np.zeros(8)
        mean[:4] = measurement
        h = measurement[3]
        std = [
            2 * self._std_weight_position * h,
            2 * self._std_weight_position * h,
            1e-2,
            2 * self._std_weight_position * h,
            10 * self._std_weight_velocity * h,
            10 * self._std_weight_velocity * h,
            1e-5,
            10 * self._std_weight_velocity * h,
        ]
        return mean, np.diag(np.square(std))

    def predict(self, mean: np.ndarray, cov: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h = mean[3]
        std = [
            self._std_weight_position * h,
            self._std_weight_position * h,
            1e-2,
            self._std_weight_position * h,
            self._std_weight_velocity * h,
            self._std_weight_velocity * h,
            1e-5,
            self._std_weight_velocity * h,
        ]
        q = np.diag(np.square(std))
        mean = self._F @ mean
        cov = self._F @ cov @ self._F.T + q
        return mean, cov

    def project(self, mean: np.ndarray, cov: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h = mean[3]
        std = [
            self._std_weight_position * h,
            self._std_weight_position * h,
            1e-1,
            self._std_weight_position * h,
        ]
        r = np.diag(np.square(std))
        return self._H @ mean, self._H @ cov @ self._H.T + r

    def update(
        self, mean: np.ndarray, cov: np.ndarray, measurement: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        pmean, pcov = self.project(mean, cov)
        chol, lower = scipy.linalg.cho_factor(pcov, lower=True, check_finite=False)
        gain = scipy.linalg.cho_solve(
            (chol, lower), (cov @ self._H.T).T, check_finite=False
        ).T
        innovation = measurement - pmean
        new_mean = mean + gain @ innovation
        new_cov = cov - gain @ pcov @ gain.T
        return new_mean, new_cov

    def gating_distance(
        self, mean: np.ndarray, cov: np.ndarray, measurements: np.ndarray
    ) -> np.ndarray:
        """Squared Mahalanobis distance to each measurement [M,4]."""
        pmean, pcov = self.project(mean, cov)
        chol = np.linalg.cholesky(pcov)
        d = measurements - pmean
        z = scipy.linalg.solve_triangular(
            chol, d.T, lower=True, check_finite=False, overwrite_b=True
        )
        return np.sum(z * z, axis=0)
