"""Disney-style BRDF shading for the SDF primitive.

Vectorized port of the reference's evaluate_shading
(testbed_sdf.cu:57-154, itself based on the public Disney BRDF notes)
with the same BRDFParams defaults (sdf_device.cuh:30-40). Pure jnp —
runs inside the jitted sphere tracer and on numpy inputs alike.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class BRDFParams:
    metallic: float = 0.0
    subsurface: float = 0.0
    specular: float = 1.0
    roughness: float = 0.5
    specular_tint: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 0.0
    basecolor: tuple = (0.8, 0.8, 0.8)
    ambientcolor: tuple = (0.0, 0.0, 0.0)


def _schlick(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return (m * m) * (m * m) * m


def _g1(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return jnp.where(
        a >= 1.0,
        1.0 / jnp.pi,
        (a2 - 1.0) / (jnp.pi * jnp.log(jnp.maximum(a2, 1e-8)) * t),
    )


def _g2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (jnp.pi * t * t)


def _smith_ggx(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / (ndotv + jnp.sqrt(jnp.maximum(a + b - a * b, 1e-12)))


def evaluate_shading(base_color, ambient_color, light_color, brdf: BRDFParams,
                     L, V, N):
    """Shade (N_pts, 3) normals against light dir L and view dir V.
    All directional args are normalized; L/V may be (3,) or (N, 3)."""
    L = jnp.broadcast_to(jnp.asarray(L, jnp.float32), N.shape)
    V = jnp.broadcast_to(jnp.asarray(V, jnp.float32), N.shape)
    base = jnp.broadcast_to(jnp.asarray(base_color, jnp.float32), N.shape)
    amb_c = jnp.broadcast_to(jnp.asarray(ambient_color, jnp.float32), N.shape)
    light = jnp.asarray(light_color, jnp.float32)

    ndl = jnp.sum(N * L, -1, keepdims=True)
    ndv = jnp.sum(N * V, -1, keepdims=True)
    H = L + V
    H = H / jnp.maximum(jnp.linalg.norm(H, axis=-1, keepdims=True), 1e-9)
    ndh = jnp.sum(N * H, -1, keepdims=True)
    ldh = jnp.sum(L * H, -1, keepdims=True)

    fl, fv = _schlick(ndl), _schlick(ndv)
    amb = amb_c * (0.2 + (fv - 0.2) * brdf.metallic) * base

    lum = jnp.sum(base * jnp.asarray([0.3, 0.6, 0.1]), -1, keepdims=True)
    ctint = base / (lum + 1e-5)
    cspec0 = (
        ((1.0 - brdf.specular_tint) + ctint * brdf.specular_tint)
        * brdf.specular * 0.08 * (1.0 - brdf.metallic)
        + base * brdf.metallic
    )
    csheen = (1.0 - brdf.sheen_tint) + ctint * brdf.sheen_tint

    fd90 = 0.5 + 2.0 * ldh * ldh * brdf.roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)

    fss90 = ldh * ldh * brdf.roughness
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(ndl + ndv, 1e-6) - 0.5) + 0.5)

    a = max(0.001, brdf.roughness**2)
    ds = _g2(ndh, a)
    fh = _schlick(ldh)
    fs = cspec0 + (1.0 - cspec0) * fh
    gs = _smith_ggx(ndl, a) * _smith_ggx(ndv, a)

    fsheen = fh * brdf.sheen * csheen

    dr = _g1(ndh, 0.1 + (0.001 - 0.1) * brdf.clearcoat_gloss)
    fr = 0.04 + 0.96 * fh
    gr = _smith_ggx(ndl, 0.25) * _smith_ggx(ndv, 0.25)
    ccs = 0.25 * brdf.clearcoat * gr * fr * dr

    diffuse = (1.0 / jnp.pi) * (fd + (ss - fd) * brdf.subsurface) * base
    out = ((diffuse + fsheen) * (1.0 - brdf.metallic) + gs * fs * ds + ccs)
    lit = out * light * ndl + amb
    return jnp.where((ndl < 0.0) | (ndv < 0.0), amb, lit)
