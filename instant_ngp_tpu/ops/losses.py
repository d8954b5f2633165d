"""Loss functions with the exact formulas of the reference
(nerf_device.cuh:75-143 and the tcnn losses the configs name,
SURVEY.md §2.2). All are elementwise; reductions happen at call sites.

Note the Huber/5 convention (nerf_device.cuh:607-612): the reference
divides Huber by 5 so its quadratic region matches L2 and converged loss
in dB reads approximately as PSNR.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common import LossType


def l2(target, prediction):
    d = prediction - target
    return d * d


def relative_l2(target, prediction):
    d = prediction - target
    denom = prediction * prediction + 1e-2
    return d * d / denom


def l1(target, prediction):
    return jnp.abs(prediction - target)


def mape(target, prediction):
    d = prediction - target
    # NB: denominator uses |prediction| (detached in the reference's
    # analytic gradient); we follow with stop_gradient for parity.
    denom = jnp.abs(jax_stop(prediction)) + 1e-2
    return jnp.abs(d) / denom


def smape(target, prediction):
    d = prediction - target
    denom = 0.5 * (jnp.abs(jax_stop(prediction)) + jnp.abs(target)) + 1e-2
    return jnp.abs(d) / denom


def huber(target, prediction, alpha=0.1):
    d = prediction - target
    ad = jnp.abs(d)
    return jnp.where(ad > alpha, ad - 0.5 * alpha, 0.5 / alpha * d * d)


def log_l1(target, prediction):
    return jnp.log(jnp.abs(prediction - target) + 1.0)


def jax_stop(x):
    import jax

    return jax.lax.stop_gradient(x)


def loss_fn(loss_type: LossType):
    """Return elementwise loss matching reference loss_and_gradient
    (nerf_device.cuh:601-621), including the Huber/5 scaling."""
    if loss_type == LossType.RELATIVE_L2:
        return relative_l2
    if loss_type == LossType.L1:
        return l1
    if loss_type == LossType.MAPE:
        return mape
    if loss_type == LossType.SMAPE:
        return smape
    if loss_type == LossType.HUBER:
        return lambda t, p: huber(t, p, 0.1) / 5.0
    if loss_type == LossType.LOGL1:
        return log_l1
    return l2


def loss_type_from_string(name: str) -> LossType:
    name = (name or "L2").lower()
    aliases = {
        "l2": LossType.L2,
        "relativel2": LossType.RELATIVE_L2,
        "l1": LossType.L1,
        "mape": LossType.MAPE,
        "smape": LossType.SMAPE,
        "huber": LossType.HUBER,
        "smoothl1": LossType.HUBER,
        "logl1": LossType.LOGL1,
    }
    return aliases.get(name, LossType.L2)
