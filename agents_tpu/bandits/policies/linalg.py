"""Linear-algebra helpers for linear bandits.

Analogue of ``tf_agents/bandits/policies/linalg.py``:
  - conjugate_gradient (:42)
  - simplified_woodbury_update (:130)
  - update_inverse (:163)
All batched over arms and jit-safe; solves prefer Cholesky (SPD systems on
the MXU) over explicit inverses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def conjugate_gradient(a_mat, b, num_iterations=None, tol: float = 1e-10):
  """Solve a_mat @ x = b for SPD a_mat via CG (reference :42).

  a_mat: [d, d]; b: [d] or [d, k].
  """
  d = a_mat.shape[0]
  num_iterations = d if num_iterations is None else num_iterations
  x = jnp.zeros_like(b)
  r = b - a_mat @ x
  p = r

  def body(_, carry):
    x, r, p = carry
    rr = jnp.sum(r * r, axis=0)
    ap = a_mat @ p
    alpha = rr / jnp.maximum(jnp.sum(p * ap, axis=0), tol)
    x = x + alpha * p
    r_new = r - alpha * ap
    beta = jnp.sum(r_new * r_new, axis=0) / jnp.maximum(rr, tol)
    p = r_new + beta * p
    return x, r_new, p

  x, _, _ = jax.lax.fori_loop(0, num_iterations, body, (x, r, p))
  return x


def simplified_woodbury_update(a_inv, x):
  """Rank-1 inverse update: (A + x xᵀ)^{-1} from A^{-1} (reference :130).

  a_inv: [d, d]; x: [d].
  """
  ax = a_inv @ x
  denom = 1.0 + x @ ax
  return a_inv - jnp.outer(ax, ax) / denom


def update_inverse(a_inv, x):
  """reference :163 — alias with the reference's naming."""
  return simplified_woodbury_update(a_inv, x)


def solve_spd(a_mat, b, ridge: float = 0.0):
  """Batched SPD solve via Cholesky: a_mat [..., d, d], b [..., d]."""
  if ridge:
    eye = jnp.eye(a_mat.shape[-1], dtype=a_mat.dtype)
    a_mat = a_mat + ridge * eye
  chol = jnp.linalg.cholesky(a_mat)
  return jax.scipy.linalg.cho_solve((chol, True), b[..., None])[..., 0]
