"""Independent NumPy oracle of the reference pipeline's semantics.

The reference ships no tests (SURVEY.md §4), so parity is established against
this plain-Python/NumPy reimplementation of its *specified math* — small,
loop-based, readable, float64 — written from the behavioral spec in SURVEY.md
§2/§3 (citations inline).  The JAX/TPU implementations must agree with these
within dtype tolerance.

This module intentionally mirrors structure-by-spec, not code: loops and
dicts here, fused masked tensor ops in the framework.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import expm


# ---------------------------------------------------------------------------
# Voxel downsample (PCL VoxelGrid semantics; ref cpp:452-456)
# ---------------------------------------------------------------------------

def voxel_downsample(points: np.ndarray, leaf_xy: float, leaf_z: float) -> np.ndarray:
    """Centroid per occupied voxel, ordered by ascending (iz, iy, ix)."""
    if len(points) == 0:
        return np.zeros((0, 3))
    # PCL quantizes in float32 with a precomputed inverse leaf; match that
    p32 = points.astype(np.float32)
    ijk = np.stack(
        [
            np.floor(p32[:, 0] * np.float32(1.0 / leaf_xy)).astype(np.int64),
            np.floor(p32[:, 1] * np.float32(1.0 / leaf_xy)).astype(np.int64),
            np.floor(p32[:, 2] * np.float32(1.0 / leaf_z)).astype(np.int64),
        ],
        axis=1,
    )
    cells: dict[tuple, list] = {}
    for p, key in zip(points, map(tuple, ijk)):
        cells.setdefault(key, []).append(p)
    out = []
    for key in sorted(cells, key=lambda k: (k[2], k[1], k[0])):
        out.append(np.mean(cells[key], axis=0))
    return np.asarray(out)


# ---------------------------------------------------------------------------
# Static removal (ref removeStatic cpp:664-706)
# ---------------------------------------------------------------------------

def remove_static(
    points: np.ndarray,
    grid: np.ndarray,
    origin_x: float,
    origin_y: float,
    yaw: float,
    resolution: float,
    tol: int,
    occupied_threshold: int = 50,
) -> np.ndarray:
    """Keep-mask per point.  Out-of-grid neighborhoods use edge clamping and
    out-of-grid points are dropped (the framework's defined behavior for the
    reference's unchecked indexing, cpp:686)."""
    h, w = grid.shape
    keep = np.zeros(len(points), dtype=bool)
    for n, p in enumerate(points):
        # reference computes in C float (f32); match its rounding
        x_map = np.float32(p[0]) - np.float32(origin_x)
        y_map = np.float32(p[1]) - np.float32(origin_y)
        c, s = np.float32(np.cos(-yaw)), np.float32(np.sin(-yaw))
        col = int(np.float32(c * x_map - s * y_map) * np.float32(1.0 / resolution))
        row = int(np.float32(s * x_map + c * y_map) * np.float32(1.0 / resolution))
        if not (0 <= row < h and 0 <= col < w):
            continue
        hit = False
        for i in range(-tol, tol + 1):
            for j in range(-tol, tol + 1):
                r = min(max(row + i, 0), h - 1)
                cc = min(max(col + j, 0), w - 1)
                v = grid[r, cc]
                if v > occupied_threshold or v == -1:
                    hit = True
                    break
            if hit:
                break
        keep[n] = not hit
    return keep


# ---------------------------------------------------------------------------
# Euclidean clustering (PCL semantics; ref cpp:471-488)
# ---------------------------------------------------------------------------

def euclidean_cluster(
    points: np.ndarray, tol: float, min_size: int, max_size: int
) -> list[list[int]]:
    """Connected components of the dist<=tol graph (BFS), size-filtered,
    ordered by (size desc, min-index asc) — PCL's largest-first order with a
    deterministic tie-break."""
    n = len(points)
    if n == 0:
        return []
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    adj = d2 <= tol * tol
    seen = np.zeros(n, dtype=bool)
    comps = []
    for seed in range(n):
        if seen[seed]:
            continue
        stack = [seed]
        seen[seed] = True
        comp = []
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in np.nonzero(adj[u] & ~seen)[0]:
                seen[v] = True
                stack.append(int(v))
        comp.sort()
        if min_size <= len(comp) <= max_size:
            comps.append(comp)
    comps.sort(key=lambda c: (-len(c), c[0]))
    return comps


# ---------------------------------------------------------------------------
# Circumcenter feature (ref getCentroid cpp:708-822)
# ---------------------------------------------------------------------------

def circumcenter(cluster_pts: np.ndarray) -> tuple[float, float]:
    n = len(cluster_pts)
    # 1. farthest pair, first strict max in (i, j) lexicographic order
    dist_max = -1.0
    pi = pj = cluster_pts[0]
    for i in range(n):
        for j in range(i + 1, n):
            d = np.linalg.norm(cluster_pts[i] - cluster_pts[j])
            if d > dist_max:
                pi, pj = cluster_pts[i], cluster_pts[j]
                dist_max = d
    # 2. farthest from PiPj line in XY; skip value-equal points (cpp:777)
    dist_max = -1.0
    pk = cluster_pts[0]
    ex, ey = pj[0] - pi[0], pj[1] - pi[1]
    norm = np.hypot(ex, ey)
    for k in range(n):
        p3 = cluster_pts[k]
        d = abs(ex * (p3[1] - pi[1]) - ey * (p3[0] - pi[0])) / max(norm, 1e-30)
        if d > dist_max:
            if np.array_equal(p3, pi) or np.array_equal(p3, pj):
                continue
            pk = p3
            dist_max = d
    # 3. circumcenter determinant (cpp:787-809)
    a = pj[0] - pi[0]
    b = pj[1] - pi[1]
    c = pk[0] - pi[0]
    d = pk[1] - pi[1]
    e = a * (pi[0] + pj[0]) + b * (pi[1] + pj[1])
    f = c * (pi[0] + pk[0]) + d * (pi[1] + pk[1])
    g = 2.0 * (a * (pk[1] - pj[1]) - b * (pk[0] - pj[0]))
    if g == 0:
        return float(pi[0]), float(pi[1])
    return float((d * e - b * f) / g), float((a * f - c * e) / g)


# ---------------------------------------------------------------------------
# Matérn-3/2 + IHGP (ref Matern32model.cpp / InfiniteHorizonGP.cpp)
# ---------------------------------------------------------------------------

def matern32(sigma2: float, magn_sigma2: float, length_scale: float):
    lam = np.sqrt(3.0) / length_scale
    F = np.array([[0.0, 1.0], [-lam * lam, -2 * lam]])
    Pinf = np.diag([magn_sigma2, magn_sigma2 * lam * lam])
    H = np.array([[1.0, 0.0]])
    return F, Pinf, H, sigma2


def dare(A, B, Q, R, eps=1e-10, maxit=100):
    X = np.eye(A.shape[0])
    for _ in range(maxit):
        Xp = X
        if abs(R) < 1e-15:
            K = np.zeros((A.shape[0], B.shape[0]))
        else:
            K = A @ (X @ B.T / ((B @ X @ B.T)[0, 0] + R))
        X = (A - K @ B) @ X @ (A - K @ B).T + K * R @ K.T + Q
        if np.linalg.norm(X - Xp) < eps:
            break
    return X


class IHGPOracle:
    """Stateful oracle mirroring InfiniteHorizonGP: ctor gains, update loop,
    getEft backward pass that leaves `m` at the smoothed head state."""

    def __init__(self, dt, F, H, Pinf, R):
        self.A = expm(F * dt)
        self.Q = Pinf - self.A @ Pinf @ self.A.T
        self.H = H
        PP = dare(self.A, H, self.Q, R)
        self.S = (H @ PP @ H.T)[0, 0] + R
        self.K = PP @ H.T / self.S
        self.PF = PP - self.K @ H @ PP
        self.HA = (H @ self.A).T
        self.AKHA = self.A - self.K @ H @ self.A
        self.m = np.zeros((2, 1))
        self.MF: list[np.ndarray] = []

    def init_step(self):
        self.MF = []  # NOTE: does NOT reset self.m (cpp:108-130)

    def update(self, y: float):
        self.m = self.AKHA @ self.m + self.K * y
        self.MF.append(self.m.copy())

    def get_eft(self) -> list[float]:
        PP = self.A @ self.PF @ self.A.T + self.Q
        G = np.linalg.solve(PP, self.A @ self.PF).T
        eft = []
        self.m = self.MF[-1].copy()
        eft.append((self.H @ self.m)[0, 0])
        for k in range(len(self.MF) - 2, -1, -1):
            self.m = self.MF[k] + G @ (self.m - self.A @ self.MF[k])
            eft.append((self.H @ self.m)[0, 0])
        return eft[::-1]


# ---------------------------------------------------------------------------
# Full reference-node oracle (cloudCallback steady state; cpp:123-233)
# ---------------------------------------------------------------------------

class ReferenceTracker:
    """End-to-end oracle of the node: perception + greedy tracking + IHGP."""

    def __init__(self, cfg, grid=None):
        self.cfg = cfg
        self.grid = grid
        self.dt = cfg.dt_gp
        self.L = cfg.data_length
        self.obj_ids: list[int] = []
        self.windows: list[list[np.ndarray]] = []  # each entry: list of (4,) [x,y,z,t]
        self.gps: list[tuple[IHGPOracle, IHGPOracle]] = []
        self.next_obj = 0
        self.spin_counter = 0
        self.first = True
        Fx, Px, Hx, Rx = matern32(
            np.exp(cfg.logSigma2_x), np.exp(cfg.logMagnSigma2_x), np.exp(cfg.logLengthScale_x)
        )
        Fy, Py, Hy, Ry = matern32(
            np.exp(cfg.logSigma2_y), np.exp(cfg.logMagnSigma2_y), np.exp(cfg.logLengthScale_y)
        )
        self._mx = (Fx, Hx, Px, Rx)
        self._my = (Fy, Hy, Py, Ry)

    # -- perception front-end ------------------------------------------------
    def cluster_pointcloud(self, points: np.ndarray, t: float) -> list[np.ndarray]:
        cfg = self.cfg
        vox = voxel_downsample(points, cfg.voxel_leaf_size, 20 * cfg.voxel_leaf_size)
        if self.grid is not None and len(vox):
            info = self.grid.info
            keep = remove_static(
                vox, self.grid.data, info.origin_x, info.origin_y,
                info.origin_yaw, info.resolution, cfg.static_tolarance,
                cfg.occupied_threshold,
            )
            vox = vox[keep]
        if len(vox) == 0:
            return []
        comps = euclidean_cluster(
            vox, cfg.cluster_tolerance, cfg.min_cluster_size, cfg.max_cluster_size
        )
        dets = []
        for comp in comps:
            cx, cy = circumcenter(vox[comp])
            dets.append(np.array([cx, cy, 0.0, t]))
        return dets

    # -- track lifecycle -----------------------------------------------------
    def _register(self, det: np.ndarray):
        self.obj_ids.append(self.next_obj)
        self.next_obj += 1
        self.windows.append([det.copy() for _ in range(self.L)])
        self.gps.append(
            (IHGPOracle(self.dt, *self._mx), IHGPOracle(self.dt, *self._my))
        )

    def _interp(self, idx: int, det: np.ndarray):
        w = self.windows[idx]
        last = w[-1].copy()
        d_total = det - last
        lost = int(round(d_total[3] / self.dt)) - 1
        for j in range(lost):
            lc = w[-1]
            c = np.array(
                [lc[0] + d_total[0] / lost, lc[1] + d_total[1] / lost, lc[2], lc[3] + self.dt]
            )
            w.pop(0)
            w.append(c)

    def step(self, points: np.ndarray, t: float) -> list[dict]:
        dets = self.cluster_pointcloud(points, t)
        if self.first:
            if not dets:
                return []
            for d in dets:
                self._register(d)
            self.first = False
            return []
        if not dets:
            return []

        this_ids = []
        for det in dets:
            registered = False
            for index, oid in enumerate(self.obj_ids):
                last = self.windows[index][-1]
                if np.hypot(det[0] - last[0], det[1] - last[1]) < self.cfg.id_threshold:
                    if det[3] - last[3] > self.cfg.interp_gap_factor * self.dt:
                        self._interp(index, det)
                    self.windows[index].pop(0)
                    self.windows[index].append(det.copy())
                    this_ids.append(oid)
                    registered = True
                    break
            if not registered:
                this_ids.append(self.next_obj)
                self._register(det)

        outputs = []
        for oid in this_ids:
            index = self.obj_ids.index(oid)
            w = self.windows[index]
            # LPF position (cpp:824-833)
            tau = self.cfg.lpf_tau
            a, b = tau / (tau + self.dt), self.dt / (tau + self.dt)
            pos = a * w[-2][:2] + b * w[-1][:2]
            # IHGP velocity (cpp:871-920)
            gpx, gpy = self.gps[index]
            gpx.init_step()
            gpy.init_step()
            vx = [(w[k + 1][0] - w[k][0]) / self.dt for k in range(self.L - 1)]
            vy = [(w[k + 1][1] - w[k][1]) / self.dt for k in range(self.L - 1)]
            mx, my = np.mean(vx), np.mean(vy)
            for k in range(self.L - 1):
                gpx.update(vx[k] - mx)
                gpy.update(vy[k] - my)
            vel = np.array([gpx.get_eft()[-1] + mx, gpy.get_eft()[-1] + my])
            vmax = self.cfg.max_velocity
            vel = np.clip(vel, -vmax, vmax)
            outputs.append({"id": oid, "pos": np.asarray(pos), "vel": vel})

        # expiry (cpp:545-584)
        self.spin_counter += 1
        if self.spin_counter > self.cfg.prune_period * self.cfg.frequency:
            keep = [
                i
                for i in range(len(self.obj_ids))
                if t - self.windows[i][-1][3] <= self.cfg.prune_period
            ]
            self.obj_ids = [self.obj_ids[i] for i in keep]
            self.windows = [self.windows[i] for i in keep]
            self.gps = [self.gps[i] for i in keep]
            self.spin_counter = 0
        return outputs
