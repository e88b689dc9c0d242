"""MLP encoder/decoder as a parameter pytree with a pure apply.

TPU-native rebuild of the reference MLPCoder (reference: model.py:67-117).
Params are plain dicts so they shard/checkpoint/optimize uniformly; the
apply is shape-polymorphic over leading batch axes and jit/vmap friendly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp


def get_activation(name: str):
    """Activation lookup (reference: model.py:43-59)."""
    activations = {
        "relu": jax.nn.relu,
        "tanh": jnp.tanh,
        "gelu": jax.nn.gelu,
    }
    if name not in activations:
        raise ValueError(f"Unknown activation '{name}'. Available: {list(activations.keys())}")
    return activations[name]


def _linear_init(key: jax.Array, fan_in: int, fan_out: int, use_bias: bool) -> Dict:
    """Torch-nn.Linear-style uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) init."""
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1)).astype(jnp.float32)
    wkey, bkey = jax.random.split(key)
    layer = {
        "w": jax.random.uniform(
            wkey, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    }
    if use_bias:
        layer["b"] = jax.random.uniform(
            bkey, (fan_out,), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    return layer


def mlp_init(
    key: jax.Array,
    input_size: int,
    target_size: int,
    hidden_layers: Sequence[int],
    use_bias: bool = False,
) -> List[Dict]:
    """Initialize an MLP as a list of layer dicts {'w': [in,out], 'b': [out]?}."""
    sizes = [input_size, *hidden_layers, target_size]
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        _linear_init(k, sizes[i], sizes[i + 1], use_bias)
        for i, k in enumerate(keys)
    ]


def mlp_apply(
    params: List[Dict],
    x: jax.Array,
    activation: str = "relu",
    last_relu: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Forward pass over [..., input_size] -> [..., target_size]
    (reference: model.py:108-117).

    ``compute_dtype`` (e.g. jnp.bfloat16) is the TPU mixed-precision
    knob: inputs/weights are cast to it at each matmul so the MXU runs
    native-bf16 multiplies with float32 accumulation
    (``preferred_element_type``); activations stay in compute dtype.
    Params are NOT cast in storage — the float32 master weights live in
    the optimizer as usual. None = run in the input dtype (float32).
    """
    act = get_activation(activation)
    n = len(params)
    for i, layer in enumerate(params):
        if compute_dtype is not None:
            x = jnp.matmul(
                x.astype(compute_dtype),
                layer["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            x = jnp.matmul(x, layer["w"], preferred_element_type=x.dtype)
        if "b" in layer:
            x = x + layer["b"]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        if i < n - 1:
            x = act(x)
    if last_relu:
        x = jax.nn.relu(x)
    return x
