"""Sparse full-graph solve: block-tridiagonal chain + Woodbury loop fill-in.

Scalable replacement for `solver.solve` / `solver.marginal_covariance` at
production capacities.  The dense path assembles an (K·6)² system — ~600 MB
of H at the default `max_keyframes=2048` — per linearization; iSAM2 in the
reference stays O(active) as the graph grows (`mapOptmization.cpp:2082-2134`).

The pose graph has exactly the structure that makes a direct sparse solve
cheap (`pipeline/lio.py` layout):

- between slots [0, K-1) are the odometry chain (slot i: keyframe i -> i+1),
- prior on keyframe 0 and GPS unaries touch single diagonal blocks,
- loop closures (slots >= K-1) are the ONLY off-tridiagonal fill-in, and
  there are few of them (capacity L = max_loop_queue·8).

So H = T + Aᵀ W A with T block-tridiagonal (6×6 blocks) and A the stacked
loop-factor Jacobians (6L rows).  We factor T once per linearization with a
block-LDLᵀ (Thomas) `lax.scan` — K sequential 6×6 Cholesky steps, latency-
bound but only ~K·O(6³) work and O(K·36) memory — and apply the Woodbury
identity for the loop correction:

    H⁻¹ b = T⁻¹b − Y S⁻¹ (A T⁻¹ b),   Y = T⁻¹Aᵀ,  S = W⁻¹ + A Y.

Marginal covariance of pose k (GPS gating, poseCovariance(3,3)/(4,4)
:2128-2133) reads the same factorization:

    Cov_k = (T⁻¹E_k)_k − Y_k S⁻¹ Y_kᵀ.

Everything is float32 with Jacobi equilibration (the reference's noise
models span 14 orders of magnitude; see solver._equilibrated_cholesky_solve).

Measured on TPU v5e (tools/prof_sparse.py): 5-iteration full solve
35/73/122 ms at K=256/1024/2048 (dense: 37/202/OOM-scale ms), marginal
covariance 26/32/44 ms (dense: 28/62/—).  The full solve runs only on loop
events (reference budget 1-5 s per loop attempt, BASELINE.md); the marginal
gates GPS factors per keyframe.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lio_slam_tpu.graph import factors as F
from lio_slam_tpu.graph.solver import SolveResult, _equilibrated_cholesky_solve
from lio_slam_tpu.utils import se3

_DAMP = 1e-5
_BIG = 1e8          # W⁻¹ diag for masked loop rows (correction -> 0)


class TridiagFactor(NamedTuple):
    """Block-LDLᵀ factorization of the equilibrated tridiagonal system."""

    chols: jax.Array    # (K, 6, 6) lower Cholesky of the Schur-reduced diag
    Lm: jax.Array       # (K, 6, 6) subdiagonal blocks, shifted: Lm[i]=T[i,i-1]
    scale: jax.Array    # (K, 6) Jacobi equilibration diag (applied symmetric)


def tridiag_factor(D: jax.Array, Loff: jax.Array) -> TridiagFactor:
    """Factor the SPD block-tridiagonal T given diagonal blocks D (K,6,6) and
    subdiagonal blocks Loff (K,6,6) with Loff[i] = T[i+1, i] (Loff[K-1]
    ignored)."""
    K = D.shape[0]
    dtype = D.dtype
    # symmetric Jacobi equilibration
    diag = jnp.diagonal(D, axis1=-2, axis2=-1)              # (K, 6)
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-12))
    Ds = D * s[:, :, None] * s[:, None, :]
    Ds = Ds + jnp.eye(6, dtype=dtype)[None] * _DAMP
    # Lm[i] = T[i, i-1] scaled by s_i (rows) and s_{i-1} (cols)
    Lm = jnp.concatenate([jnp.zeros((1, 6, 6), dtype), Loff[:-1]], axis=0)
    Lm = Lm * s[:, :, None] * jnp.concatenate(
        [jnp.ones((1, 6), dtype), s[:-1]], axis=0)[:, None, :]

    def fwd(c_prev_chol, inp):
        Di, Li = inp
        # G = L c_prev⁻¹ Lᵀ  via triangular solves on the stored Cholesky
        Z = jax.scipy.linalg.cho_solve((c_prev_chol, True), Li.T)   # c⁻¹ Lᵀ
        Ci = Di - Li @ Z
        Ci = 0.5 * (Ci + Ci.T) + jnp.eye(6, dtype=dtype) * _DAMP
        chol = jnp.linalg.cholesky(Ci)
        return chol, chol

    # first block has no subdiagonal coupling (Lm[0] = 0 handles it)
    init = jnp.linalg.cholesky(jnp.eye(6, dtype=dtype))
    _, chols = jax.lax.scan(fwd, init, (Ds, Lm))
    return TridiagFactor(chols=chols, Lm=Lm, scale=s)


def tridiag_solve(f: TridiagFactor, b: jax.Array) -> jax.Array:
    """Solve T x = b for b of shape (K, 6) or (K, 6, M)."""
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]
    bs = b * f.scale[..., None]

    # forward: y_i = b_i − L_i c_{i-1}⁻¹ y_{i-1} (needs the PREVIOUS chol)
    chol_prev = jnp.concatenate([jnp.eye(6, dtype=b.dtype)[None],
                                 f.chols[:-1]], axis=0)

    def fwd(y_prev, inp):
        cp, Li, bi = inp
        y = bi - Li @ jax.scipy.linalg.cho_solve((cp, True), y_prev)
        return y, y

    y0 = jnp.zeros_like(bs[0])
    _, ys = jax.lax.scan(fwd, y0, (chol_prev, f.Lm, bs))

    # backward: x_i = c_i⁻¹ (y_i − L_{i+1}ᵀ x_{i+1})
    Lnext = jnp.concatenate([f.Lm[1:], jnp.zeros_like(f.Lm[:1])], axis=0)

    def bwd(x_next, inp):
        chol, Ln, yi = inp
        x = jax.scipy.linalg.cho_solve((chol, True), yi - Ln.T @ x_next)
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(bs[0]),
                         (f.chols, Lnext, ys), reverse=True)
    x = xs * f.scale[..., None]
    return x[..., 0] if squeeze else x


# ---------------------------------------------------------------------------
# assembly: chain/unary part (T) + gradient b + loop low-rank part (A, W)
# ---------------------------------------------------------------------------


def _assemble(graph: F.PoseGraph):
    """Linearize all factors; return (D, Loff, b, chi2, loop terms)."""
    K = graph.poses.shape[0]
    B = graph.bt_i.shape[0]
    nL = B - (K - 1)                       # loop-slot capacity
    dtype = graph.poses.dtype

    D = jnp.zeros((K, 6, 6), dtype)
    b = jnp.zeros((K, 6), dtype)

    # prior on pose 0
    e0, J0 = F.linearize_prior(graph)
    w0 = graph.prior_info
    D = D.at[0].add(jnp.einsum("ri,r,rj->ij", J0, w0, J0))
    b = b.at[0].add(-J0.T @ (w0 * e0))

    # all between factors at once
    eb, Ji, Jj = F.linearize_between(graph)
    wb = graph.bt_info * graph.bt_mask[:, None]

    # chain part: slots [0, K-1), slot i couples poses (i, i+1).  The D/Loff
    # scatters below go to FIXED positions (slot i -> poses i, i+1), so a
    # factor routed through this region with (bt_i, bt_j) != (i, i+1) would
    # land its blocks on the wrong poses — drop it instead of corrupting the
    # solve (round-4 advisor; non-chain topology belongs in the loop region)
    c = K - 1
    slots = jnp.arange(c)
    chain_ok = (graph.bt_i[:c] == slots) & (graph.bt_j[:c] == slots + 1)
    wc = wb[:c] * chain_ok[:, None]
    D = D.at[:c].add(jnp.einsum("bri,br,brj->bij", Ji[:c], wc, Ji[:c]))
    D = D.at[1:K].add(jnp.einsum("bri,br,brj->bij", Jj[:c], wc, Jj[:c]))
    # T[i+1, i] = Jjᵀ W Ji
    Loff = jnp.concatenate(
        [jnp.einsum("bri,br,brj->bij", Jj[:c], wc, Ji[:c]),
         jnp.zeros((1, 6, 6), dtype)], axis=0)
    b = b.at[:c].add(-jnp.einsum("bri,br,br->bi", Ji[:c], wc, eb[:c]))
    b = b.at[1:K].add(-jnp.einsum("bri,br,br->bi", Jj[:c], wc, eb[:c]))

    # gps unaries
    eg, Jg = F.linearize_gps(graph)
    wg = graph.gps_info * graph.gps_mask[:, None]
    gi = graph.gps_i
    D = D.at[gi].add(jnp.einsum("gri,gr,grj->gij", Jg, wg, Jg))
    b = b.at[gi].add(-jnp.einsum("gri,gr,gr->gi", Jg, wg, eg))

    # loop factors: gradient contribution + low-rank terms
    el, Jli, Jlj = eb[c:], Ji[c:], Jj[c:]
    wl = wb[c:]                                    # (L, 6)
    li, lj = graph.bt_i[c:], graph.bt_j[c:]
    lmask = graph.bt_mask[c:]
    b = b.at[li].add(-jnp.einsum("lri,lr,lr->li", Jli, wl, el))
    b = b.at[lj].add(-jnp.einsum("lri,lr,lr->li", Jlj, wl, el))

    # inactive poses: identity diagonal (keeps T SPD); zero any off-diagonal
    # coupling that touches an inactive pose
    act = graph.pose_mask.astype(dtype)
    D = D * act[:, None, None]
    D = D + jnp.eye(6, dtype=dtype)[None] * (1.0 - act)[:, None, None]
    act_next = jnp.concatenate([act[1:], jnp.zeros(1, dtype)])
    Loff = Loff * (act * act_next)[:, None, None]
    b = b * act[:, None]

    chi2 = (jnp.sum(wb * eb * eb) + jnp.sum(wg * eg * eg)
            + jnp.sum(w0 * e0 * e0))
    loops = (li, lj, Jli, Jlj, wl, lmask, nL)
    return D, Loff, b, chi2, loops


def _woodbury_apply(f: TridiagFactor, loops, rhs: jax.Array) -> jax.Array:
    """H⁻¹ rhs using the factored chain + loop low-rank correction.
    rhs: (K, 6) or (K, 6, M).  The loop correction only runs when a loop
    factor is actually active (lax.cond) — pre-loop missions pay just the
    chain solve."""
    li, lj, Jli, Jlj, wl, lmask, nL = loops
    tb = tridiag_solve(f, rhs)                       # T⁻¹ rhs
    if nL == 0:
        return tb
    K = f.chols.shape[0]
    dtype = rhs.dtype

    def with_loops(tb):
        # Aᵀ as a dense (K, 6, 6L) scatter of the loop Jacobian blocks
        At = jnp.zeros((K, 6, nL, 6), dtype)
        At = At.at[li, :, jnp.arange(nL), :].add(
            jnp.swapaxes(Jli, -1, -2) * lmask[:, None, None])
        At = At.at[lj, :, jnp.arange(nL), :].add(
            jnp.swapaxes(Jlj, -1, -2) * lmask[:, None, None])
        At = At.reshape(K, 6, nL * 6)
        Y = tridiag_solve(f, At)                     # (K, 6, 6L)

        def a_apply(x):
            """A x for x (K, 6, ...): gather + Jacobian apply -> (6L, ...)."""
            xi = x[li]                               # (L, 6, ...)
            xj = x[lj]
            rows = (jnp.einsum("lrs,ls...->lr...", Jli, xi)
                    + jnp.einsum("lrs,ls...->lr...", Jlj, xj))
            rows = rows * (lmask[:, None, None] if rows.ndim == 3
                           else lmask[:, None])
            return rows.reshape((nL * 6,) + rows.shape[2:])

        AY = a_apply(Y)                              # (6L, 6L)
        winv = jnp.where(lmask[:, None], 1.0 / jnp.maximum(wl, 1e-12), _BIG)
        S = AY + jnp.diag(winv.reshape(-1))
        Atb = a_apply(tb)                            # (6L,) or (6L, M)
        corr = (_equilibrated_cholesky_solve(S, Atb) if Atb.ndim == 1
                else _chol_solve_multi(S, Atb))
        return tb - jnp.einsum("ksl,l...->ks...", Y, corr)

    return jax.lax.cond(jnp.any(lmask), with_loops, lambda t: t, tb)


def _chol_solve_multi(S: jax.Array, B: jax.Array) -> jax.Array:
    """Equilibrated Cholesky solve with multiple right-hand sides."""
    S = 0.5 * (S + S.T)
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
    Dinv = 1.0 / d
    Ss = S * Dinv[:, None] * Dinv[None, :]
    Ss = Ss + jnp.eye(S.shape[0], dtype=S.dtype) * 1e-5
    c = jax.scipy.linalg.cho_factor(Ss, lower=True)
    y = jax.scipy.linalg.cho_solve(c, B * Dinv[:, None])
    return y * Dinv[:, None]


# ---------------------------------------------------------------------------
# public API — mirrors solver.solve / solver.marginal_covariance
# ---------------------------------------------------------------------------


def backtrack_step(g: F.PoseGraph, delta: jax.Array, chi2_now: jax.Array):
    """Chi2-gated backtracking line search on a GN step (round-4 verdict
    next #4): on graphs with long-lever-arm loop factors the raw GN step
    overshoots the linearization's validity region and DIVERGES with more
    iterations (measured on the K=2048 loop graph: chi2 7e6 -> 8e9 going
    from 5 to 20 iterations — float64 behaves identically, so precision is
    not the problem; step control is).  Candidate scales [1, 1/2, 1/4, 1/8]
    are costed with the errors-only `F.graph_chi2` and the best is kept
    only if it REDUCES the cost — descent is monotone, so more iterations
    can only help.  Returns (new_poses, scale_used)."""

    def at_scale(s):
        R, t = se3.pose6_to_Rt(g.poses)
        dR, dt = se3.se3_exp(delta * s)
        Rn, tn = se3.compose(R, t, dR, dt)
        return se3.Rt_to_pose6(Rn, tn)

    scales = jnp.asarray([1.0, 0.5, 0.25, 0.125], g.poses.dtype)
    cand = jax.vmap(at_scale)(scales)                # (4, K, 6)
    costs = jax.vmap(lambda p: F.graph_chi2(g, p))(cand)
    best = jnp.argmin(costs)
    improved = costs[best] < chi2_now
    new_poses = jnp.where(improved, cand[best], g.poses)
    return new_poses, jnp.where(improved, scales[best], 0.0)


@partial(jax.jit, static_argnames=("iterations",))
def solve_sparse(graph: F.PoseGraph, iterations: int = 5) -> SolveResult:
    """Full-graph GN over all active poses, O(K) memory / O(K·6³ + L²·K)
    time per iteration, with backtracking step control (monotone descent).
    Drop-in for `solver.solve(graph, pose_mask, n)`."""

    def step(_, carry):
        g, _, _ = carry
        D, Loff, b, chi2, loops = _assemble(g)
        f = tridiag_factor(D, Loff)
        delta = _woodbury_apply(f, loops, b)         # (K, 6)
        delta = jnp.where(g.pose_mask[:, None], delta, 0.0)
        new_poses, scale = backtrack_step(g, delta, chi2)
        g2 = g._replace(poses=new_poses)
        return (g2, jnp.linalg.norm(delta) * scale, chi2)

    g, dn, chi2 = jax.lax.fori_loop(
        0, iterations, step,
        (graph, jnp.zeros((), graph.poses.dtype),
         jnp.zeros((), graph.poses.dtype)))
    return SolveResult(graph=g, delta_norm=dn, chi2=chi2)


@jax.jit
def marginal_covariance_sparse(graph: F.PoseGraph, idx: jax.Array) -> jax.Array:
    """(6,6) marginal covariance of pose `idx` from the sparse factorization
    (isam->marginalCovariance parity for GPS gating, :2128-2133)."""
    K = graph.poses.shape[0]
    dtype = graph.poses.dtype
    D, Loff, _, _, loops = _assemble(graph)
    f = tridiag_factor(D, Loff)
    # E_k: one-hot block rhs (K, 6, 6)
    E = jnp.zeros((K, 6, 6), dtype)
    E = E.at[idx].set(jnp.eye(6, dtype=dtype))
    return _woodbury_apply(f, loops, E)[idx]
