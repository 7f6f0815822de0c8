"""ICI-sharded Sim3 pose-graph optimization.

The single-chip essential-graph solver (solvers/pose_graph.py) is built on
edge-parallel reductions; this variant shards the EDGE list over a device
mesh with `shard_map`: each device computes residuals/Jacobians for its
edge shard, and every global quantity (gradient, block-Jacobi diagonal, CG
matvec) is a `psum` over the 'graph' axis riding ICI — the pose-graph
analogue of data-parallel gradient aggregation (SURVEY.md §5: "pose-graph
solves sharded over ICI if multi-chip"). Vertices are replicated (a few
thousand 7-vectors — tiny next to edge work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam_system_tpu.utils import lie
from orb_slam_system_tpu.solvers.pose_graph import _edge_residual, _sim3_from_arrays


def optimize_essential_graph_sharded(
    mesh: Mesh,
    R0, t0, s0, v_fixed, v_valid,
    e_i, e_j, e_R, e_t, e_s, e_valid,
    n_iters: int = 20, cg_iters: int = 50,
):
    """Same contract as solvers.pose_graph.optimize_essential_graph, with
    edges sharded over mesh axis 'graph'. Pads the edge list to the shard
    multiple (padding edges are invalid)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    K = R0.shape[0]
    E = e_i.shape[0]
    Ep = -(-E // n_dev) * n_dev

    def pad(x, fill=0):
        if x.shape[0] == Ep:
            return jnp.asarray(x)
        pad_shape = (Ep - x.shape[0],) + x.shape[1:]
        return jnp.concatenate(
            [jnp.asarray(x), jnp.full(pad_shape, fill, x.dtype)], axis=0)

    e_i = pad(jnp.asarray(e_i, jnp.int32))
    e_j = pad(jnp.asarray(e_j, jnp.int32))
    e_R = pad(jnp.asarray(e_R, jnp.float32))
    e_t = pad(jnp.asarray(e_t, jnp.float32))
    e_s = pad(jnp.asarray(e_s, jnp.float32), 1)
    e_valid = pad(jnp.asarray(e_valid), False)
    f32 = jnp.float32
    free = jnp.asarray(v_valid) & ~jnp.asarray(v_fixed)

    def local(R0_, t0_, s0_, free_, ei, ej, eR, et, es, ev):
        ew = ev.astype(f32)

        def residuals(xi):
            def per_edge(ii, jj, Re, te, se):
                S0_i = _sim3_from_arrays(R0_[ii], t0_[ii], s0_[ii])
                S0_j = _sim3_from_arrays(R0_[jj], t0_[jj], s0_[jj])
                Sji = _sim3_from_arrays(Re, te, se)
                return _edge_residual(xi[ii], xi[jj], S0_i, S0_j, Sji)
            return jax.vmap(per_edge)(ei, ej, eR, et, es)

        def edge_jacobians(xi):
            def per_edge(ii, jj, Re, te, se):
                S0_i = _sim3_from_arrays(R0_[ii], t0_[ii], s0_[ii])
                S0_j = _sim3_from_arrays(R0_[jj], t0_[jj], s0_[jj])
                Sji = _sim3_from_arrays(Re, te, se)
                f = lambda a, b: _edge_residual(a, b, S0_i, S0_j, Sji)
                return (jax.jacfwd(f, 0)(xi[ii], xi[jj]),
                        jax.jacfwd(f, 1)(xi[ii], xi[jj]))
            return jax.vmap(per_edge)(ei, ej, eR, et, es)

        def gn_step(xi, lam):
            r = residuals(xi) * ew[:, None]
            Ji, Jj = edge_jacobians(xi)
            Ji = Ji * ew[:, None, None]
            Jj = Jj * ew[:, None, None]
            # Global gradient + block diagonal: local scatter + psum.
            b_loc = -(jnp.zeros((K, 7), f32)
                      .at[ei].add(jnp.einsum("eab,ea->eb", Ji, r))
                      .at[ej].add(jnp.einsum("eab,ea->eb", Jj, r)))
            b = jax.lax.psum(b_loc, axis) * free_[:, None]
            Hd_loc = (jnp.zeros((K, 7, 7), f32)
                      .at[ei].add(jnp.einsum("eab,eac->ebc", Ji, Ji))
                      .at[ej].add(jnp.einsum("eab,eac->ebc", Jj, Jj)))
            Hd = jax.lax.psum(Hd_loc, axis) + (lam + 1e-6) * jnp.eye(7, dtype=f32)
            Minv = jnp.linalg.inv(Hd)

            def matvec(x):
                x = x * free_[:, None]
                u = (jnp.einsum("eab,eb->ea", Ji, x[ei])
                     + jnp.einsum("eab,eb->ea", Jj, x[ej]))
                y_loc = (jnp.zeros((K, 7), f32)
                         .at[ei].add(jnp.einsum("eab,ea->eb", Ji, u))
                         .at[ej].add(jnp.einsum("eab,ea->eb", Jj, u)))
                y = jax.lax.psum(y_loc, axis) + (lam + 1e-6) * x
                return y * free_[:, None]

            def precond(x):
                return jnp.einsum("kab,kb->ka", Minv, x) * free_[:, None]

            x = jnp.zeros((K, 7), f32)
            r_cg = b
            z = precond(r_cg)
            p = z
            rz = jnp.sum(r_cg * z)

            def cg_body(_, st):
                x, r_cg, p, rz = st
                Ap = matvec(p)
                denom = jnp.sum(p * Ap)
                alpha = rz / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
                x = x + alpha * p
                r_new = r_cg - alpha * Ap
                z_new = precond(r_new)
                rz_new = jnp.sum(r_new * z_new)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
                return x, r_new, z_new + beta * p, rz_new

            x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body,
                                           (x, r_cg, p, rz))
            cost = jax.lax.psum(jnp.sum(r * r), axis)
            return x, cost

        def lm_iter(_, carry):
            xi, lam = carry
            dx, cost0 = gn_step(xi, lam)
            xi_new = xi + dx
            cost1 = jax.lax.psum(
                jnp.sum((residuals(xi_new) * ew[:, None]) ** 2), axis)
            improved = cost1 < cost0
            xi = jnp.where(improved, xi_new, xi)
            lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0),
                           1e-10, 1e6)
            return xi, lam

        xi, _ = jax.lax.fori_loop(
            0, n_iters, lm_iter,
            (jnp.zeros((K, 7), f32), jnp.asarray(1e-10, f32)))
        return xi

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False)
    from orb_slam_system_tpu.utils.precision import f32_solver
    xi = jax.jit(f32_solver(smapped))(
        jnp.asarray(R0, f32), jnp.asarray(t0, f32), jnp.asarray(s0, f32),
        free, e_i, e_j, e_R, e_t, e_s, e_valid)

    def apply(ii):
        S = lie.sim3_mul(lie.sim3_exp(xi[ii]), _sim3_from_arrays(
            jnp.asarray(R0, f32)[ii], jnp.asarray(t0, f32)[ii],
            jnp.asarray(s0, f32)[ii]))
        return S["R"], S["t"], S["s"]

    Rn, tn, sn = jax.vmap(apply)(jnp.arange(K))
    Rn = jnp.where(free[:, None, None], Rn, jnp.asarray(R0, f32))
    tn = jnp.where(free[:, None], tn, jnp.asarray(t0, f32))
    sn = jnp.where(free, sn, jnp.asarray(s0, f32))
    return Rn, tn, sn
