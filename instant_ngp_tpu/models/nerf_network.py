"""NerfNetwork — the two-MLP composite NeRF model.

Behavioral parity with the reference's NerfNetwork (nerf_network.h:77-672):

  pos ──HashGrid──▶ density MLP ──▶ 16-wide density output
                                      │ (channel 0 is density logit)
  [density_out ⊕ SH(dir) ⊕ extra] ──▶ RGB MLP ──▶ rgb (3)
  network output = (rgb0, rgb1, rgb2, density_logit)

Parameter packing order [density_net, rgb_net, pos_enc, dir_enc]
(nerf_network.h:357-372) is honored by the snapshot module.

TPU-native departures: params are a pytree of fp32 arrays; compute is
bf16 on the MXU; the density-only path (`density()`) skips the RGB MLP
exactly like the reference's density(...) (nerf_network.h:270-280).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.encodings import Encoding, encoding_from_config
from ..ops.mlp import MLP, mlp_from_config


@dataclasses.dataclass(frozen=True)
class NerfNetwork:
    pos_encoding: Encoding
    dir_encoding: Encoding
    density_network: MLP
    rgb_network: MLP
    n_extra_dims: int = 0

    @property
    def n_pos_dims(self):
        return 3

    @property
    def n_dir_dims(self):
        return 3

    def init(self, key: jax.Array) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "density_net": self.density_network.init(k1),
            "rgb_net": self.rgb_network.init(k2),
        }
        p = self.pos_encoding.init(k3)
        if p is not None:
            params["pos_enc"] = p
        d = self.dir_encoding.init(k4)
        if d is not None:
            params["dir_enc"] = d
        return params

    def matrix_mask(self, params: dict) -> dict:
        mask = {
            "density_net": [True for _ in params["density_net"]],
            "rgb_net": [True for _ in params["rgb_net"]],
        }
        if "pos_enc" in params:
            mask["pos_enc"] = jax.tree.map(lambda _: False, params["pos_enc"])
        if "dir_enc" in params:
            mask["dir_enc"] = jax.tree.map(lambda _: False, params["dir_enc"])
        return mask

    def build_bricks(self, params: dict):
        """Bricked inference tables for the position encoding (dense
        levels; see GridEncoding.build_bricks). None when the encoding
        has no brick support."""
        if hasattr(self.pos_encoding, "build_bricks"):
            return self.pos_encoding.build_bricks(params.get("pos_enc"))
        return None

    def density(self, params: dict, pos: jax.Array, max_level=None,
                compute_dtype=jnp.bfloat16, bricks=None, fast=False):
        """Density-only path: pos (N,3) → (N, 16) density-MLP output.
        Channel 0 is the density logit (reference nerf_network.h:270-280).
        fast: stochastic-corner hashed gathers (interactive render)."""
        if (bricks is not None or fast) and hasattr(self.pos_encoding, "encode_infer"):
            feats = self.pos_encoding.encode_infer(
                params.get("pos_enc"), pos, bricks=bricks,
                max_level=max_level, compute_dtype=compute_dtype,
                stochastic_corner=fast)
        else:
            feats = self.pos_encoding(
                params.get("pos_enc"), pos, max_level=max_level,
                compute_dtype=compute_dtype)
        return self.density_network(params["density_net"], feats, compute_dtype=compute_dtype)

    def __call__(
        self,
        params: dict,
        pos: jax.Array,
        dir_warped: jax.Array,
        extra: Optional[jax.Array] = None,
        max_level=None,
        compute_dtype=jnp.bfloat16,
        bricks=None,
        fast=False,
    ) -> jax.Array:
        """Full forward. Args: pos (N,3) in [0,1]; dir_warped (N,3) in
        [0,1] (warp_direction applied by the caller); extra (N,E) latent
        dims. Returns (N, 4): rgb logits + density logit."""
        d_out = self.density(params, pos, max_level=max_level,
                             compute_dtype=compute_dtype, bricks=bricks,
                             fast=fast)
        dir_feats = self.dir_encoding(
            params.get("dir_enc"), dir_warped, compute_dtype=compute_dtype
        )
        inputs = [d_out, dir_feats]
        if self.n_extra_dims > 0:
            if extra is None:
                extra = jnp.zeros((pos.shape[0], self.n_extra_dims), compute_dtype)
            inputs.append(extra.astype(compute_dtype))
        rgb_in = jnp.concatenate(inputs, axis=-1)
        rgb = self.rgb_network(params["rgb_net"], rgb_in, compute_dtype=compute_dtype)
        return jnp.concatenate([rgb[:, :3], d_out[:, :1]], axis=-1)

    @staticmethod
    def from_config(config: dict, n_extra_dims: int = 0) -> "NerfNetwork":
        """Build from the NeRF JSON schema (encoding/dir_encoding/
        network/rgb_network blocks; reference testbed.cu:4266-4327)."""
        pos_enc = encoding_from_config(config.get("encoding", {"otype": "HashGrid"}), 3)
        dir_enc = encoding_from_config(
            config.get(
                "dir_encoding",
                {"otype": "SphericalHarmonics", "degree": 4},
            ),
            3,
        )
        # Density MLP: 16-wide output, first channel = density logit
        # (reference nerf_network.h:91-98: density net output width 16).
        density_net = mlp_from_config(config.get("network", {}), pos_enc.n_output_dims, 16)
        rgb_in_dims = 16 + dir_enc.n_output_dims + n_extra_dims
        rgb_net = mlp_from_config(config.get("rgb_network", {}), rgb_in_dims, 3)
        return NerfNetwork(pos_enc, dir_enc, density_net, rgb_net, n_extra_dims)
