"""NetworkWithInputEncoding: encoding → MLP (the model used by the
image/SDF/volume primitives; reference builds it via tcnn's
create_network factories in testbed.cu:4160-4412)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.encodings import Encoding, encoding_from_config
from ..ops.mlp import MLP, mlp_from_config


@dataclasses.dataclass(frozen=True)
class NetworkWithInputEncoding:
    encoding: Encoding
    network: MLP

    @property
    def n_input_dims(self):
        return self.encoding.n_dims_to_encode

    @property
    def n_output_dims(self):
        return self.network.n_output_dims

    def init(self, key: jax.Array) -> dict:
        k_enc, k_net = jax.random.split(key)
        params = {"net": self.network.init(k_net)}
        enc_params = self.encoding.init(k_enc)
        if enc_params is not None:
            params["enc"] = enc_params
        return params

    def __call__(self, params: dict, x: jax.Array, max_level=None, compute_dtype=jnp.bfloat16):
        feats = self.encoding(params.get("enc"), x, max_level=max_level, compute_dtype=compute_dtype)
        return self.network(params["net"], feats, compute_dtype=compute_dtype)

    def matrix_mask(self, params: dict) -> dict:
        """True for MLP weights (l2_reg applies), False for tables."""
        mask = {"net": [True for _ in params["net"]]}
        if "enc" in params:
            mask["enc"] = jax.tree.map(lambda _: False, params["enc"])
        return mask

    @staticmethod
    def from_config(config: dict, n_input_dims: int, n_output_dims: int) -> "NetworkWithInputEncoding":
        enc = encoding_from_config(config.get("encoding", {"otype": "Identity"}), n_input_dims)
        net = mlp_from_config(config.get("network", {}), enc.n_output_dims, n_output_dims)
        return NetworkWithInputEncoding(enc, net)
