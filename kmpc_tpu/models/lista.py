"""LISTA sparse encoder: unrolled iterative soft-thresholding.

TPU-native rebuild of the reference LISTA module (reference:
model.py:120-209). The K refinement iterations run under
``jax.lax.fori_loop`` so the whole encoder is one compiled loop whose
body is a [B, z] x [z, z] matmul (MXU) + a VPU shrink — no Python-level
unrolling (reference loops in Python at model.py:206-207).

Canonical LISTA (Gregor & LeCun 2010):
    c      = W_e x
    z^(0)  = T_{alpha/L}(c)
    z^(k+1)= T_{alpha/L}(S z^(k) + c)
with W_e init (1/L) W_d^T and S init I - (1/L) W_d^T W_d.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from kmpc_tpu.models.mlp import mlp_apply, mlp_init


def shrink(x: jax.Array, threshold: float) -> jax.Array:
    """Soft-thresholding operator T_t(x) = sign(x) max(|x| - t, 0)
    (reference: model.py:30-40)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - threshold, 0.0)


def lista_init(
    key: jax.Array,
    xdim: int,
    zdim: int,
    Wd_init: jax.Array,
    L: float,
    linear_encoder: bool,
    encoder_layers,
    encoder_use_bias: bool,
) -> Dict:
    """Build LISTA params (reference: model.py:159-188).

    Wd_init has shape [xdim, zdim] (columns are dictionary atoms).
    """
    assert Wd_init.shape == (xdim, zdim), (
        f"Wd_init shape {Wd_init.shape} doesn't match expected ({xdim}, {zdim})"
    )
    params: Dict = {}
    if linear_encoder:
        # We stored as [xdim, zdim] so encoding is x @ We; equals (1/L) Wd.
        params["We"] = (1.0 / L) * Wd_init
    else:
        params["We_mlp"] = mlp_init(key, xdim, zdim, encoder_layers, encoder_use_bias)
    params["S"] = jnp.eye(zdim, dtype=jnp.float32) - (1.0 / L) * (Wd_init.T @ Wd_init)
    return params


def lista_apply(
    params: Dict,
    x: jax.Array,
    num_loops: int,
    alpha: float,
    L: float,
    activation: str = "relu",
    last_relu: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Forward pass [..., xdim] -> sparse codes [..., zdim]
    (reference: model.py:190-209).

    ``compute_dtype`` = TPU mixed precision (see mlp.mlp_apply): the
    [z, z] refinement matmuls run in that dtype with float32 MXU
    accumulation; the loop carry stays in compute dtype."""
    if "We" in params:
        if compute_dtype is not None:
            c = jnp.matmul(
                x.astype(compute_dtype),
                params["We"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            c = jnp.matmul(x, params["We"], preferred_element_type=x.dtype)
    else:
        c = mlp_apply(params["We_mlp"], x, activation=activation,
                      last_relu=last_relu, compute_dtype=compute_dtype)

    threshold = alpha / L
    if compute_dtype is not None:
        c = c.astype(compute_dtype)
        S = params["S"].astype(compute_dtype)
    else:
        S = params["S"]
    z0 = shrink(c, threshold)

    def body(_, z):
        acc = jnp.matmul(
            z, S,
            preferred_element_type=(
                jnp.float32 if compute_dtype is not None else z.dtype
            ),
        )
        return shrink((acc + c).astype(z.dtype), threshold)

    return jax.lax.fori_loop(0, num_loops, body, z0)
