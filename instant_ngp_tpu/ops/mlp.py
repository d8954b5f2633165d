"""Bias-free MLP — the TPU equivalent of tiny-cuda-nn's FullyFusedMLP /
CutlassMLP (SURVEY.md §2.2; reference configs use n_neurons 16-128).

Design notes (TPU-first):
  * tcnn MLPs have NO biases; we match that (parameter layout parity for
    snapshots, and it's also what the hash-grid + MLP combo wants).
  * Compute in bfloat16 on the MXU with float32 accumulation
    (`preferred_element_type`); master params stay float32, so no loss
    scaling is needed (reference Trainer uses fp16 + loss_scale 128,
    testbed.h:311 — unnecessary here but the knob is preserved upstream).
  * Widths of 64/128 with giant batches map straight onto the 128×128
    systolic array; XLA fuses the elementwise activations in between.
    A hand-fused Pallas variant (all layers resident in VMEM) lives in
    ops/pallas/mlp_kernel.py and is used on the hot paths.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def activation_fn(name: str) -> Callable:
    name = (name or "none").lower()
    return {
        "none": lambda x: x,
        "relu": lambda x: jnp.maximum(x, 0.0),
        "leakyrelu": lambda x: jnp.where(x > 0, x, 0.01 * x),
        "exponential": jnp.exp,
        "sine": jnp.sin,
        "sigmoid": jax.nn.sigmoid,
        "logistic": jax.nn.sigmoid,
        "squareplus": lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0)),
        "softplus": jax.nn.softplus,
        "tanh": jnp.tanh,
    }[name]


@dataclasses.dataclass(frozen=True)
class MLP:
    """Static MLP spec. Params are a list of weight matrices W_i with
    layout (fan_in, fan_out); forward is x @ W_0 @ ... @ W_last."""

    n_input_dims: int
    n_output_dims: int
    n_neurons: int = 64
    n_hidden_layers: int = 2
    activation: str = "ReLU"
    output_activation: str = "None"
    # Run the forward through the Pallas fused kernel (all layers
    # VMEM-resident, ops/pallas/mlp_kernel.py). Requires batch % 512 == 0
    # and simple activations; backward falls back to autodiff.
    use_pallas: bool = False

    @property
    def layer_sizes(self) -> tuple[tuple[int, int], ...]:
        if self.n_hidden_layers == 0:
            return ((self.n_input_dims, self.n_output_dims),)
        sizes = [(self.n_input_dims, self.n_neurons)]
        for _ in range(self.n_hidden_layers - 1):
            sizes.append((self.n_neurons, self.n_neurons))
        sizes.append((self.n_neurons, self.n_output_dims))
        return tuple(sizes)

    @property
    def n_params(self) -> int:
        return sum(a * b for a, b in self.layer_sizes)

    def init(self, key: jax.Array) -> list[jax.Array]:
        """He-uniform init (suits the ReLU nets the configs use)."""
        ws = []
        for (fan_in, fan_out), k in zip(self.layer_sizes, jax.random.split(key, len(self.layer_sizes))):
            limit = np.sqrt(6.0 / fan_in)
            ws.append(jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -limit, limit))
        return ws

    def __call__(self, params: Sequence[jax.Array], x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        if (
            self.use_pallas
            and x.shape[0] % 512 == 0
            and self.activation.lower() in ("relu", "none")
            and self.output_activation.lower() in ("relu", "none")
        ):
            from .pallas.mlp_kernel import fused_mlp

            ws = [w.astype(compute_dtype) for w in params]
            return fused_mlp(ws, x.astype(compute_dtype),
                             self.activation.lower(), self.output_activation.lower())
        act = activation_fn(self.activation)
        out_act = activation_fn(self.output_activation)
        h = x.astype(compute_dtype)
        n = len(params)
        for i, w in enumerate(params):
            h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
            if i < n - 1:
                h = act(h).astype(compute_dtype)
        return out_act(h)


def mlp_from_config(cfg: dict, n_input_dims: int, n_output_dims: int) -> MLP:
    return MLP(
        n_input_dims=n_input_dims,
        n_output_dims=n_output_dims,
        n_neurons=int(cfg.get("n_neurons", 64)),
        n_hidden_layers=int(cfg.get("n_hidden_layers", 2)),
        activation=cfg.get("activation", "ReLU"),
        output_activation=cfg.get("output_activation", "None"),
    )
