"""Sequential convex programming (SQP) over the structured IPM.

The TPU-native analogue of the reference's multiple-shooting SQP solver
(``ocs2_sqp/ocs2_sqp/src/MultipleShootingSolver.cpp:146-214``): per-iteration
{linearize all shooting nodes -> solve the OCP-QP -> line search}, except:

- Linearization is a ``vmap`` over nodes (replacing the reference's thread
  pool + atomic work index, MultipleShootingSolver.cpp:385-449).
- The QP backend is :mod:`cheeta_mpc_tpu.ops.ocpqp` (replacing HPIPM).
- The backtracking filter line search (MultipleShootingSolver.cpp:509-619)
  becomes a *parallel ladder*: a fixed set of candidate step sizes is rolled
  out at once and the best acceptable one selected — same semantics, no
  data-dependent loop, fully jit/vmap-friendly.
- A fixed iteration count replaces convergence exits (the deployment config
  in the reference already runs exactly 1 iteration per MPC step —
  task.info:34 — i.e. the real-time iteration scheme).

The problem is supplied functionally: the caller provides a ``linearize``
callback producing the stage-stacked LQ data at an iterate, and a ``merit``
callback for the line search.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from cheeta_mpc_tpu.core.types import OcpQpData
from cheeta_mpc_tpu.ops.ocpqp import IpmSettings, solve_ocp_qp


class ScpSettings(NamedTuple):
    iterations: int = 4  # SQP iterations (reference sqpIteration, task.info:34)
    ipm: IpmSettings = IpmSettings()
    # Parallel line-search ladder (reference alpha_decay 0.5, alpha_min 1e-4:
    # MultipleShootingSettings.h:40-80). 1.0 first => full Newton when it helps.
    alphas: tuple = (1.0, 0.5, 0.25, 0.125)
    # QP backend: 'riccati' (O(N) scan, any horizon, stage equalities) or
    # 'condensed' (states eliminated, dense MXU GEMMs — fastest for short
    # horizons, no stage equalities). Mirrors HPIPM's two modes.
    qp_backend: str = 'riccati'


class ScpResult(NamedTuple):
    x: jnp.ndarray  # (N+1, nx) final state trajectory iterate
    u: jnp.ndarray  # (N, nu)
    merit: jnp.ndarray  # merit value at the final iterate
    qp_mu: jnp.ndarray  # last QP complementarity (solver health)
    gains_K: jnp.ndarray  # (N, nu, nx) Riccati feedback of the last QP
    gains_k: jnp.ndarray  # (N, nu)


def solve_nonlinear_ocp(
    linearize: Callable[[jnp.ndarray, jnp.ndarray], OcpQpData],
    merit: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_init: jnp.ndarray,
    u_init: jnp.ndarray,
    settings: ScpSettings = ScpSettings(),
) -> ScpResult:
    """Iterate {linearize -> IPM QP -> ladder line search} a fixed number of
    times from the warm-start trajectory ``(x_init, u_init)``.

    ``linearize(x, u)`` must return the full :class:`OcpQpData` in *deviation*
    coordinates around (x, u) — including dynamics defects in ``dyn.b`` and
    the shifted constraint bounds. ``merit(x, u)`` is the scalar line-search
    metric (cost + constraint-violation penalty).
    """
    alphas = jnp.asarray(settings.alphas, x_init.dtype)
    if settings.qp_backend == 'condensed':
        from cheeta_mpc_tpu.ops.condensed import solve_ocp_qp_condensed
        qp_solve = solve_ocp_qp_condensed
    elif settings.qp_backend == 'riccati':
        qp_solve = solve_ocp_qp
    else:
        raise ValueError(f"unknown qp_backend {settings.qp_backend!r}")

    def iteration(carry, _):
        x, u = carry
        data = linearize(x, u)
        sol = qp_solve(data, settings.ipm)

        def try_alpha(a):
            return merit(x + a * sol.dx, u + a * sol.du)

        merits = jax.vmap(try_alpha)(alphas)
        base = merit(x, u)
        # Accept the largest step that improves the merit; if none does,
        # take the smallest step of the ladder (the QP direction is a descent
        # direction for the exact-penalty merit with large enough penalty).
        improves = merits < base
        best = jnp.where(jnp.any(improves),
                         jnp.argmax(improves),  # first (largest) improving
                         len(settings.alphas) - 1)
        a = alphas[best]
        x_new = x + a * sol.dx
        u_new = u + a * sol.du
        return (x_new, u_new), (merits[best], sol.mu, sol.gains.K, sol.gains.k)

    (x, u), (merits, mus, Ks, ks) = jax.lax.scan(
        iteration, (x_init, u_init), None, length=settings.iterations)
    return ScpResult(x=x, u=u, merit=merits[-1], qp_mu=mus[-1],
                     gains_K=Ks[-1], gains_k=ks[-1])
