"""Pallas fused MLP — all layers resident in VMEM, one kernel launch.

TPU counterpart of tiny-cuda-nn's FullyFusedMLP (SURVEY.md §2.2): the
weight matrices of the tiny NGP MLPs (64×64-class) total a few tens of
KB, so the whole network fits in VMEM next to a batch tile; fusing the
layers avoids writing activations back to HBM between layers.

Usage: `fused_mlp(ws, x, activation=...)` — a drop-in for MLP.__call__
for inference-style forward passes. The backward falls back to
autodiff of the reference implementation (custom_vjp), so training can
enable it without a hand-written backward kernel.

Measured reality check (v5e): correctness-validated against the
reference forward (0 error), but this naive 512-row tiling underuses
the MXU (414 ms vs ~3 ms unfused XLA at 131k rows) — the per-grid-step
launch overhead dominates at these tiny widths. It stays default-off
(`MLP(..., use_pallas=True)` opt-in) as an EXPERIMENT, not a hot-path
component: the framework's hot loops are deliberately XLA, because the
actual bottleneck is the hash-table gather (~7 ns/row) and this
toolchain's Mosaic lowers no usable vectorized gather —
`tpu.dynamic_gather` fails to compile beyond one 8-sublane vreg
(scripts/bench_dyngather.py), so a fused march+gather+MLP megakernel
cannot currently beat XLA's gather on TPU. See ARCHITECTURE.md "Why
the hot loops are XLA, not Pallas".
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512  # batch rows per grid step


def _act(name: str, h):
    name = name.lower()
    if name == "relu":
        return jnp.maximum(h, 0.0)
    if name == "none":
        return h
    if name == "sigmoid" or name == "logistic":
        return jax.nn.sigmoid(h)
    if name == "exponential":
        return jnp.exp(h)
    raise NotImplementedError(name)


def _fused_mlp_fwd_impl(ws, x, activation: str, output_activation: str):
    n_layers = len(ws)

    def kernel(*refs):
        x_ref = refs[0]
        w_refs = refs[1 : 1 + n_layers]
        out_ref = refs[1 + n_layers]
        h = x_ref[:]
        for i, w_ref in enumerate(w_refs):
            h = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
            if i < n_layers - 1:
                h = _act(activation, h).astype(x_ref.dtype)
        out_ref[:] = _act(output_activation, h).astype(out_ref.dtype)

    N = x.shape[0]
    out_dim = ws[-1].shape[1]
    grid = (max(N // TILE_N, 1),)
    in_specs = [
        pl.BlockSpec((TILE_N, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ws]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_N, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, out_dim), jnp.float32),
    )(x, *ws)


def _reference_forward(ws, x, activation, output_activation):
    h = x
    for i, w in enumerate(ws):
        h = jnp.dot(h, w.astype(h.dtype), preferred_element_type=jnp.float32)
        if i < len(ws) - 1:
            h = _act(activation, h).astype(x.dtype)
    return _act(output_activation, h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mlp(ws, x, activation: str = "relu", output_activation: str = "none"):
    """Forward through a bias-free MLP with all weights VMEM-resident.

    ws: list of (in, out) matrices (out widths should be multiples of
    128 lanes for peak MXU efficiency; smaller widths work but waste
    lanes). x: (N, in) with N a multiple of 512.
    """
    return _fused_mlp_fwd_impl(ws, x, activation, output_activation)


def _fused_fwd(ws, x, activation, output_activation):
    return _fused_mlp_fwd_impl(ws, x, activation, output_activation), (ws, x)


def _fused_bwd(activation, output_activation, res, g):
    ws, x = res
    # backward via autodiff of the unfused reference (correct, not
    # kernel-fused; the fused backward arrives with the megakernel)
    _, vjp = jax.vjp(lambda ws_, x_: _reference_forward(ws_, x_, activation, output_activation), ws, x)
    return vjp(g)


fused_mlp.defvjp(_fused_fwd, _fused_bwd)
