"""Independent numpy oracle of the reference C++ CILQR semantics.

Written from the behavioural description in SURVEY.md sections 2-3 (with
file:line citations against /root/reference/src/cilqr_solver.cpp) as a test
fixture: straight-line numpy with the same branchy control flow as the C++,
used to cross-check the masked-lockstep JAX solver. Deliberately slow and
literal -- clarity over speed.
"""

from __future__ import annotations

import numpy as np


def propagate(x, u, dt, wb, ref_point):
    if ref_point == "rear_center":
        return np.array([
            x[0] + x[2] * np.cos(x[3]) * dt,
            x[1] + x[2] * np.sin(x[3]) * dt,
            x[2] + u[0] * dt,
            x[3] + x[2] * np.tan(u[1]) * dt / wb,
        ])
    beta = np.arctan(np.tan(u[1]) / 2)
    return np.array([
        x[0] + x[2] * np.cos(beta + x[3]) * dt,
        x[1] + x[2] * np.sin(beta + x[3]) * dt,
        x[2] + u[0] * dt,
        x[3] + 2 * x[2] * np.sin(beta) * dt / wb,
    ])


def jacobians(x, u, dt, wb, N, ref_point):
    A = np.tile(np.eye(4), (N, 1, 1))
    B = np.zeros((N, 4, 2))
    for i in range(N):
        v, yaw, stl = x[i, 2], x[i, 3], u[i, 1]
        if ref_point == "rear_center":
            A[i, 0, 2] = np.cos(yaw) * dt
            A[i, 0, 3] = -v * np.sin(yaw) * dt
            A[i, 1, 2] = np.sin(yaw) * dt
            A[i, 1, 3] = v * np.cos(yaw) * dt
            A[i, 3, 2] = np.tan(stl) * dt / wb
            B[i, 2, 0] = dt
            B[i, 3, 1] = (v * dt / wb) / np.cos(stl) ** 2
        else:
            # reference quirk: the Jacobian's beta is atan(tan(stl / 2))
            # (src/utils.cpp:292), NOT the dynamics' atan(tan(stl) / 2)
            # (src/utils.cpp:265); dbds below is the exact derivative of
            # the DYNAMICS beta (src/utils.cpp:293) -- mirrored as-is
            beta = np.arctan(np.tan(stl / 2))
            dbds = 0.5 * (1 + np.tan(stl) ** 2) / (1 + 0.25 * np.tan(stl) ** 2)
            A[i, 0, 2] = np.cos(beta + yaw) * dt
            A[i, 0, 3] = -v * np.sin(beta + yaw) * dt
            A[i, 1, 2] = np.sin(beta + yaw) * dt
            A[i, 1, 3] = v * np.cos(beta + yaw) * dt
            A[i, 3, 2] = 2 * np.sin(beta) * dt / wb
            B[i, 0, 1] = -v * np.sin(beta + yaw) * dt * dbds
            B[i, 1, 1] = v * np.cos(beta + yaw) * dt * dbds
            B[i, 2, 0] = dt
            B[i, 3, 1] = (2 * v * dt / wb) * np.cos(beta) * dbds
    return A, B


class OracleCILQR:
    """Reference-semantics solver (src/cilqr_solver.cpp:85-153)."""

    RUNNING, CONVERGED, BP_FAIL, FP_FAIL, SMALL_STEP = 0, 1, 2, 3, 4

    def __init__(self, gc, num_obstacles):
        g = gc.get
        self.dt = g("delta_t")
        self.N = int(g("lqr/N"))
        self.wq = np.diag([g("lqr/w_pos"), g("lqr/w_pos"), g("lqr/w_vel"), g("lqr/w_yaw")])
        self.wr = np.diag([g("lqr/w_acc"), g("lqr/w_stl")])
        self.solve_type = gc.solve_type
        self.oq1, self.oq2 = g("lqr/obstacle_exp_q1"), g("lqr/obstacle_exp_q2")
        self.sq1, self.sq2 = g("lqr/state_exp_q1"), g("lqr/state_exp_q2")
        self.alm_rho_init = g("lqr/alm_rho_init")
        self.alm_gamma = g("lqr/alm_gamma")
        self.max_rho, self.max_mu = g("lqr/max_rho"), g("lqr/max_mu")
        self.use_last = bool(g("lqr/use_last_solution"))
        self.max_iter = int(g("iteration/max_iter"))
        self.init_lamb = g("iteration/init_lamb")
        self.lamb_decay = g("iteration/lamb_decay")
        self.lamb_amplify = g("iteration/lamb_amplify")
        self.max_lamb = g("iteration/max_lamb")
        self.conv_thresh = g("iteration/convergence_threshold")
        self.accept_thresh = g("iteration/accept_step_threshold")
        self.wb = g("vehicle/wheelbase")
        self.width = g("vehicle/width")
        self.length = g("vehicle/length")
        self.vmax, self.vmin = g("vehicle/velo_max"), g("vehicle/velo_min")
        self.amax, self.amin = g("vehicle/acc_max"), g("vehicle/acc_min")
        self.stl = g("vehicle/stl_lim")
        self.d_safe = g("vehicle/d_safe")
        self.ref_point = g("vehicle/reference_point")
        self.M = num_obstacles
        self.C = 8 + 2 * num_obstacles
        self.is_first = True
        self.last_u = None
        self.iters = None
        self.status_trace = []

    # -- geometry helpers --------------------------------------------------
    def front_rear(self, x):
        yaw = x[3]
        whba = self.wb * np.array([np.cos(yaw), np.sin(yaw)])
        if self.ref_point == "rear_center":
            return x[:2] + whba, x[:2].copy()
        return x[:2] + 0.5 * whba, x[:2] - 0.5 * whba

    def ellipse_ab(self):
        r = 0.5 * self.width
        return (0.5 * self.length + 6 * self.d_safe + r,
                0.5 * self.width + self.d_safe + r)

    def margin(self, pnt, obs):
        a, b = self.ellipse_ab()
        d = pnt - obs[:2]
        th = obs[2]
        xs = np.cos(th) * d[0] + np.sin(th) * d[1]
        ys = -np.sin(th) * d[0] + np.cos(th) * d[1]
        return 1 - (xs**2 / a**2 + ys**2 / b**2)

    def margin_grad(self, pnt, obs):
        a, b = self.ellipse_ab()
        d = pnt - obs[:2]
        th = obs[2]
        R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
        ps = R @ d
        g_std = np.array([-2 * ps[0] / a**2, -2 * ps[1] / b**2])
        return R.T @ g_std

    def fr_jacobians(self, yaw):
        half = 0.5 * self.wb
        jf = np.array([[1, 0], [0, 1], [0, 0],
                       [-half * np.sin(yaw), half * np.cos(yaw)]], dtype=float)
        jr = np.array([[1, 0], [0, 1], [0, 0],
                       [half * np.sin(yaw), -half * np.cos(yaw)]], dtype=float)
        if self.ref_point == "rear_center":
            jf[3] = [-self.wb * np.sin(yaw), self.wb * np.cos(yaw)]
            jr[3] = [0.0, 0.0]
        return jf, jr

    # -- nearest reference point: greedy walk (src/cilqr_solver.cpp:289-314)
    def ref_exact_points(self, x, ref_xyyaw):
        start = 0
        out = np.zeros((x.shape[0], 3))
        for i in range(x.shape[0]):
            min_idx, min_d = -1, np.inf
            for j in range(start, ref_xyyaw.shape[0]):
                d = np.hypot(x[i, 0] - ref_xyyaw[j, 0], x[i, 1] - ref_xyyaw[j, 1])
                if min_idx < 0 or d < min_d:
                    min_idx, min_d = j, d
                else:
                    break
            out[i] = ref_xyyaw[min_idx, :3]
            start = min_idx
        return out

    # -- penalties ---------------------------------------------------------
    def pen_value(self, c, kind, col):
        if self.solve_type == "barrier":
            q1, q2 = (self.sq1, self.sq2) if kind == "state" else (self.oq1, self.oq2)
            return q1 * np.exp(q2 * c)
        mu = self.alm_mu[self.cur_k - 1, col]
        return self.alm_rho * max(c + mu / self.alm_rho, 0.0) ** 2 / 2

    def pen_grad_hess(self, c, cdot, kind, col):
        if self.solve_type == "barrier":
            q1, q2 = (self.sq1, self.sq2) if kind == "state" else (self.oq1, self.oq2)
            b = q1 * np.exp(q2 * c)
            bd = q2 * b * cdot
            bdd = q2**2 * b * np.outer(cdot, cdot)
            return bd, bdd
        mu = self.alm_mu[self.cur_k - 1, col]
        if (c + mu / self.alm_rho) > 0:
            bd = self.alm_rho * (c + mu / self.alm_rho) * cdot
            return bd, np.outer(bd, cdot)
        return np.zeros_like(cdot), np.zeros((len(cdot), len(cdot)))

    # -- cost --------------------------------------------------------------
    def constraint_rows(self, k, u, x, ref_pts, obs_preds, rb):
        uk, xk, rk = u[k - 1], x[k], ref_pts[k]
        d_sign = (xk[1] - rk[1]) * np.cos(rk[2]) - (xk[0] - rk[0]) * np.sin(rk[2])
        sgn = -1.0 if d_sign < 0 else 1.0
        cur_d = sgn * np.hypot(xk[0] - rk[0], xk[1] - rk[1])
        cs = [uk[0] - self.amax, self.amin - uk[0],
              uk[1] - self.stl, -self.stl - uk[1],
              xk[2] - self.vmax, self.vmin - xk[2],
              cur_d - (rb[0] - self.width / 2), (rb[1] + self.width / 2) - cur_d]
        for j in range(self.M):
            f, r = self.front_rear(xk)
            ob = obs_preds[j, k]
            cs.append(self.margin(f, ob))
            cs.append(self.margin(r, ob))
        return cs, cur_d, d_sign

    def total_cost(self, u, x, ref_xyyaw, ref_velo, obs_preds, rb):
        ref_pts = self.ref_exact_points(x, ref_xyyaw)
        ref_states = np.column_stack([ref_pts[:, 0], ref_pts[:, 1],
                                      np.full(len(x), ref_velo), ref_pts[:, 2]])
        dx = x - ref_states
        J = np.trace(dx @ self.wq @ dx.T) + np.trace(u @ self.wr @ u.T)
        for k in range(1, self.N + 1):
            self.cur_k = k
            cs, _, _ = self.constraint_rows(k, u, x, ref_pts, obs_preds, rb)
            for col, c in enumerate(cs):
                kind = "state" if col < 8 else "obs"
                J += self.pen_value(c, kind, col)
        return J

    def derivatives(self, u, x, ref_xyyaw, ref_velo, obs_preds, rb):
        N = self.N
        ref_pts = self.ref_exact_points(x, ref_xyyaw)
        ref_states = np.column_stack([ref_pts[:, 0], ref_pts[:, 1],
                                      np.full(len(x), ref_velo), ref_pts[:, 2]])
        l_u = 2 * u @ self.wr
        l_x = 2 * (x - ref_states) @ self.wq
        l_uu = np.tile(2 * self.wr, (N, 1, 1))
        l_xx = np.tile(2 * self.wq, (N + 1, 1, 1))
        for k in range(1, N + 1):
            self.cur_k = k
            cs, cur_d, d_sign = self.constraint_rows(k, u, x, ref_pts, obs_preds, rb)
            xk, rk = x[k], ref_pts[k]
            h = np.hypot(xk[0] - rk[0], xk[1] - rk[1])
            pos_up = np.array([(xk[0] - rk[0]) / h, (xk[1] - rk[1]) / h, 0, 0])
            if d_sign < 0:
                pos_up = -pos_up
            grads_u = [np.array([1., 0.]), np.array([-1., 0.]),
                       np.array([0., 1.]), np.array([0., -1.])]
            grads_x = [np.array([0., 0., 1., 0.]), np.array([0., 0., -1., 0.]),
                       pos_up, -pos_up]
            for col in range(4):
                bd, bdd = self.pen_grad_hess(cs[col], grads_u[col], "state", col)
                l_u[k - 1] += bd
                l_uu[k - 1] += bdd
            for col in range(4, 8):
                bd, bdd = self.pen_grad_hess(cs[col], grads_x[col - 4], "state", col)
                l_x[k] += bd
                l_xx[k] += bdd
            if self.solve_type == "alm":
                for col in range(8):
                    self.alm_mu_next[k - 1, col] = np.clip(
                        self.alm_mu[k - 1, col] + self.alm_rho * cs[col], 0.0, self.max_mu)
            for j in range(self.M):
                f, r = self.front_rear(xk)
                ob = obs_preds[j, k]
                jf, jr = self.fr_jacobians(xk[3])
                gf = jf @ self.margin_grad(f, ob)
                gr = jr @ self.margin_grad(r, ob)
                for col, g in ((8 + 2 * j, gf), (9 + 2 * j, gr)):
                    bd, bdd = self.pen_grad_hess(cs[col], g, "obs", col)
                    l_x[k] += bd
                    l_xx[k] += bdd
                    if self.solve_type == "alm":
                        self.alm_mu_next[k - 1, col] = np.clip(
                            self.alm_mu[k - 1, col] + self.alm_rho * cs[col], 0.0, self.max_mu)
        return l_x, l_u, l_xx, l_uu

    # -- iLQR machinery ----------------------------------------------------
    def backward(self, u, x, lamb, ref_xyyaw, ref_velo, obs_preds, rb):
        l_x, l_u, l_xx, l_uu = self.derivatives(u, x, ref_xyyaw, ref_velo, obs_preds, rb)
        A, B = jacobians(x, u, self.dt, self.wb, self.N, self.ref_point)
        d = np.zeros((self.N, 2))
        K = np.zeros((self.N, 2, 4))
        dV = np.zeros(2)
        V_x, V_xx = l_x[self.N], l_xx[self.N]
        for i in range(self.N - 1, -1, -1):
            Q_x = l_x[i] + A[i].T @ V_x
            Q_u = l_u[i] + B[i].T @ V_x
            Q_xx = l_xx[i] + A[i].T @ V_xx @ A[i]
            Q_uu = l_uu[i] + B[i].T @ V_xx @ B[i] + lamb * np.eye(2)
            Q_ux = B[i].T @ V_xx @ A[i]
            det = Q_uu[0, 0] * Q_uu[1, 1] - Q_uu[0, 1] * Q_uu[1, 0]
            if Q_uu[0, 0] <= 0 or det <= 0:
                self.status = self.BP_FAIL
                return d, K, dV
            inv = np.linalg.inv(Q_uu)
            d[i] = -inv @ Q_u
            K[i] = -inv @ Q_ux
            V_x = Q_x + K[i].T @ Q_uu @ d[i] + K[i].T @ Q_u + Q_ux.T @ d[i]
            V_xx = Q_xx + K[i].T @ Q_uu @ K[i] + K[i].T @ Q_ux + Q_ux.T @ K[i]
            dV[0] += 0.5 * d[i] @ Q_uu @ d[i]
            dV[1] += d[i] @ Q_u
        return d, K, dV

    def forward(self, u, x, d, K, alpha):
        nu = np.zeros_like(u)
        nx = np.zeros_like(x)
        nx[0] = x[0]
        for i in range(self.N):
            nu[i] = u[i] + K[i] @ (nx[i] - x[i]) + alpha * d[i]
            nx[i + 1] = propagate(nx[i], nu[i], self.dt, self.wb, self.ref_point)
        return nu, nx

    def iter_step(self, u, x, lamb, ref_xyyaw, ref_velo, obs_preds, rb):
        ori = self.total_cost(u, x, ref_xyyaw, ref_velo, obs_preds, rb)
        self.status = self.RUNNING
        d, K, dV = self.backward(u, x, lamb, ref_xyyaw, ref_velo, obs_preds, rb)
        if self.status == self.BP_FAIL:
            return u, x, False
        alpha = 1.0
        while alpha > 1e-6:
            nu, nx = self.forward(u, x, d, K, alpha)
            nJ = self.total_cost(nu, nx, ref_xyyaw, ref_velo, obs_preds, rb)
            decay = ori - nJ
            if abs(alpha - 1.0) < 1e-5 and abs(decay) < self.conv_thresh:
                self.status = self.CONVERGED
                return nu, nx, False  # effective_flag stays false (quirk)
            approx = -(alpha**2 * dV[0] + alpha * dV[1])
            if decay > 0 and (approx < 0 or decay / approx > self.accept_thresh):
                if abs(alpha - 1.0) > 1e-5:
                    self.status = self.SMALL_STEP
                return nu, nx, True
            alpha *= 0.5
        if self.solve_type == "alm":
            self.alm_mu = self.alm_mu_next.copy()
            self.alm_rho = min((1 + self.alm_gamma) * self.alm_rho, self.max_rho)
        self.status = self.FP_FAIL
        return u, x, False

    def solve(self, x0, ref_xyyaw, ref_velo, obs_preds, rb):
        if self.solve_type == "alm" and (not self.use_last or self.is_first):
            self.alm_rho = self.alm_rho_init
            self.alm_mu = np.zeros((self.N, self.C))
            self.alm_mu_next = np.zeros((self.N, self.C))
        if not self.is_first and self.use_last:
            u = np.vstack([self.last_u[1:], self.last_u[-1:]])
        else:
            u = np.zeros((self.N, 2))
            self.is_first = False
        x = np.zeros((self.N + 1, 4))
        x[0] = x0
        for i in range(self.N):
            x[i + 1] = propagate(x[i], u[i], self.dt, self.wb, self.ref_point)
        lamb = self.init_lamb
        self.status = self.RUNNING
        self.status_trace = []
        self.iters = self.max_iter
        for itr in range(self.max_iter):
            nu, nx, effective = self.iter_step(u, x, lamb, ref_xyyaw, ref_velo,
                                               obs_preds, rb)
            if effective:
                u, x = nu, nx
            self.status_trace.append(self.status)
            if self.status in (self.BP_FAIL, self.FP_FAIL):
                lamb = max(self.lamb_amplify, lamb * self.lamb_amplify)
            elif self.status == self.RUNNING:
                lamb *= self.lamb_decay
            if lamb > self.max_lamb:
                self.iters = itr
                break
            elif self.status == self.CONVERGED:
                self.iters = itr
                break
        self.last_u = u.copy()
        return u, x
