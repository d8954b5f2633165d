"""Neural image primitive: 2D coord → RGB regression.

Behavioral parity with the reference's image mode (testbed_image.cu):
  * training positions uniform / stratified / Halton in [0,1]²
    (kernels testbed_image.cu:39-82)
  * targets = bilinear texture read, converted linear→sRGB unless
    `linear_colors` (eval_image_kernel_and_snap, :177-229)
  * L2 loss on 3 output dims; batch = Testbed's training batch size
  * `compute_image_mse` with snap-to-pixel-centers and optional byte
    quantization (:490-547)
  * render = per-pixel inference (+ optional checkerboard GT split,
    render_image :304-391)

TPU-native: the texture lives in HBM as a jnp array; target reads are
batched gathers; the whole train step (sample → read → forward → loss →
adam) is one jit program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import linear_to_srgb, srgb_to_linear
from ..models.network import NetworkWithInputEncoding
from ..ops.losses import loss_fn, loss_type_from_string
from ..ops.optimizers import optimizer_from_config


def bilinear_read(texture: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear texture fetch matching the reference's pixel addressing
    (pos*res - 0.5, clamped; testbed_image.cu:196-211).

    texture: (H, W, C); uv: (N, 2) in [0,1] with x=u (width), y=v (height).
    """
    h, w = texture.shape[:2]
    res = jnp.array([w, h], jnp.float32)
    pos = jnp.clip(uv * res - 0.5, 0.0, res - (1.0 + 1e-4))
    pos_int = jnp.floor(pos)
    frac = pos - pos_int
    x0 = jnp.clip(pos_int[:, 0].astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(pos_int[:, 1].astype(jnp.int32), 0, h - 2)

    def read(xi, yi):
        return texture[yi, xi]

    v00 = read(x0, y0)
    v10 = read(x0 + 1, y0)
    v01 = read(x0, y0 + 1)
    v11 = read(x0 + 1, y0 + 1)
    fx = frac[:, 0:1]
    fy = frac[:, 1:2]
    return (
        (1 - fx) * (1 - fy) * v00
        + fx * (1 - fy) * v10
        + (1 - fx) * fy * v01
        + fx * fy * v11
    )


def snapped_read(texture: jax.Array, uv: jax.Array) -> jax.Array:
    h, w = texture.shape[:2]
    res = jnp.array([w, h], jnp.float32)
    pos_int = jnp.floor(uv * res).astype(jnp.int32)
    x = jnp.clip(pos_int[:, 0], 0, w - 1)
    y = jnp.clip(pos_int[:, 1], 0, h - 1)
    return texture[y, x]


def halton(index, base: int):
    """Vectorized Halton sequence (reference halton23_kernel)."""
    index = jnp.asarray(index, jnp.uint32)
    result = jnp.zeros(index.shape, jnp.float32)
    f = jnp.full(index.shape, 1.0 / base, jnp.float32)
    i = index
    for _ in range(32 // max(1, int(np.log2(base)))):
        result = result + f * (i % base).astype(jnp.float32)
        i = i // base
        f = f / base
    return result


def sobol2d(index):
    """First two dimensions of the Sobol sequence (reference ERandomMode
    Sobol; ld_random_val sampler). Dim 0 is the bit-reversed van der
    Corput sequence; dim 1 uses the classic x²+x+1 direction numbers."""
    index = jnp.asarray(index, jnp.uint32)
    # dim 0: reverse 32 bits
    v = index
    v = ((v >> 1) & jnp.uint32(0x55555555)) | ((v & jnp.uint32(0x55555555)) << 1)
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333)) << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF)) << 8)
    x0 = ((v >> 16) | (v << 16)).astype(jnp.float32) * np.float32(2.0**-32)
    # dim 1: direction numbers v_k = m_k << (31-k) with the classic
    # dimension-2 recurrence m_k = m_{k-1} ⊕ 2·m_{k-1}
    # (1, 3, 5, 15, 17, 51, 85, 255, …)
    m1 = [1]
    for k in range(1, 32):
        m1.append(m1[k - 1] ^ (2 * m1[k - 1]))
    dirs = np.array([np.uint32((m1[k] << (31 - k)) & 0xFFFFFFFF) for k in range(32)],
                    np.uint32)
    # natural (non-Gray) digit order to pair with the natural-order
    # van der Corput dim 0 — mixing orders breaks joint stratification
    acc = jnp.zeros(index.shape, jnp.uint32)
    for k in range(32):
        bit = (index >> k) & 1
        acc = acc ^ (bit * dirs[k]).astype(jnp.uint32)
    x1 = acc.astype(jnp.float32) * np.float32(2.0**-32)
    return x0, x1


class ImageTask:
    """Owns model params/optimizer state and jitted step/render fns."""

    def __init__(
        self,
        image: np.ndarray,
        is_hdr: bool,
        config: dict,
        seed: int = 1337,
        batch_size: int = 1 << 18,
        random_mode: str = "stratified",
        linear_colors: bool = False,
        snap_to_pixel_centers: bool = False,
    ):
        self.resolution = (image.shape[1], image.shape[0])  # (W, H)
        self.is_hdr = is_hdr
        self.linear_colors = linear_colors
        self.snap_to_pixel_centers = snap_to_pixel_centers
        self.random_mode = random_mode
        self.batch_size = batch_size
        self.config = config

        from ..models.factory import autoconfig_grid_encoding

        config = dict(config)
        config["encoding"] = autoconfig_grid_encoding(
            config.get("encoding", {}), "image", image_resolution=self.resolution
        )
        tex = np.asarray(image, np.float32)
        if not is_hdr:
            # LDR files are sRGB-encoded; the reference stores textures
            # linear and re-encodes on read — store linear here too.
            tex = np.concatenate([np.asarray(srgb_to_linear(tex[..., :3])), tex[..., 3:]], -1)
        self.texture = jnp.asarray(tex)

        self.model = NetworkWithInputEncoding.from_config(config, n_input_dims=2, n_output_dims=3)
        self.loss = loss_fn(loss_type_from_string(config.get("loss", {}).get("otype", "L2")))

        key = jax.random.PRNGKey(seed)
        self.params = self.model.init(key)
        self.opt = optimizer_from_config(
            config.get("optimizer", {}), matrix_mask=self.model.matrix_mask(self.params)
        )
        self.opt_state = self.opt.init(self.params)
        self.training_step = 0
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)

        # pyngp shall_train_encoding / shall_train_network freeze
        # toggles; changing them requires rebuild_jit_programs()
        self.shall_train_encoding = True
        self.shall_train_network = True
        self._jit_step = jax.jit(self._step)
        self._jit_infer = jax.jit(self._infer)

    def rebuild_jit_programs(self):
        """Re-trace the step after changing trace-time knobs
        (shall_train_*)."""
        self._jit_step = jax.jit(self._step)

    # --- training ---
    def _sample_positions(self, key, step):
        n = self.batch_size
        if self.random_mode == "halton":
            idx = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(n) * step.astype(jnp.uint32)
            return jnp.stack([halton(idx, 2), halton(idx, 3)], axis=-1)
        if self.random_mode == "sobol":
            idx = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(n) * step.astype(jnp.uint32)
            x0, x1 = sobol2d(idx)
            return jnp.stack([x0, x1], axis=-1)
        uv = jax.random.uniform(key, (n, 2))
        if self.random_mode == "stratified" and (n & (n - 1)) == 0 and (n.bit_length() - 1) % 2 == 0:
            log2s = (n.bit_length() - 1) // 2
            size = 1 << log2s
            i = jnp.arange(n, dtype=jnp.uint32)
            x = (i & (size - 1)).astype(jnp.float32)
            y = (i >> log2s).astype(jnp.float32)
            uv = uv / size + jnp.stack([x, y], -1) / size
        return uv

    def _targets_at(self, uv, texture=None):
        val = bilinear_read(self.texture if texture is None else texture, uv)[:, :3]
        if not self.linear_colors:
            val = linear_to_srgb(val)
        return val

    def _step(self, params, opt_state, texture, key, step):
        # texture passed as a jit argument (a closure capture would embed
        # it as an HLO constant shipped to the compiler on every compile)
        uv = self._sample_positions(key, step)
        target = self._targets_at(uv, texture)

        def loss_value(p):
            pred = self.model(p, uv).astype(jnp.float32)
            return jnp.mean(self.loss(target, pred))

        loss, grads = jax.value_and_grad(loss_value)(params)
        new_params, opt_state = self.opt.update(grads, opt_state, params)
        if not self.shall_train_encoding and "enc" in new_params:
            new_params = {**new_params, "enc": params["enc"]}
        if not self.shall_train_network:
            new_params = {**new_params, "net": params["net"]}
        return new_params, opt_state, loss

    def train(self, n_steps: int = 1) -> float:
        loss = None
        for _ in range(n_steps):
            self._key, sub = jax.random.split(self._key)
            self.params, self.opt_state, loss = self._jit_step(
                self.params, self.opt_state, self.texture, sub,
                jnp.uint32(self.training_step),
            )
            self.training_step += 1
        return float(loss) if loss is not None else 0.0

    # --- inference / eval ---
    def _infer(self, params, uv):
        return self.model(params, uv).astype(jnp.float32)

    @property
    def inference_params(self):
        return self.opt.inference_params(self.opt_state, self.params)

    def render(self, width: Optional[int] = None, height: Optional[int] = None,
               gt_checkerboard: bool = False, checker_px: int = 64) -> np.ndarray:
        """Full-frame inference → (H, W, 3) float32 in the training color
        space (sRGB unless linear_colors).

        gt_checkerboard: composite ground-truth tiles in a checkerboard
        with the prediction (the reference's side-by-side GT comparison
        for the image primitive; GT reads snap to pixel centers like
        eval_image_kernel_and_snap, testbed_image.cu:160-200)."""
        w = width or self.resolution[0]
        h = height or self.resolution[1]
        if gt_checkerboard:
            pred = self.render(width=w, height=h)
            iw, ih = self.resolution
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            px = np.clip((xs + 0.5) * iw // w, 0, iw - 1).astype(np.int64)
            py = np.clip((ys + 0.5) * ih // h, 0, ih - 1).astype(np.int64)
            tex = np.asarray(self.texture)  # stored linear
            gt = tex[py, px, :3].astype(np.float32)
            if not self.is_hdr and not self.linear_colors:
                from ..common import linear_to_srgb

                gt = np.asarray(linear_to_srgb(np.clip(gt, 0.0, 1.0)))
            tiles = ((xs // checker_px) + (ys // checker_px)) % 2 == 0
            return np.where(tiles[..., None], pred, gt).astype(np.float32)
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        uv = jnp.stack(
            [(xs.reshape(-1) + 0.5) / w, (ys.reshape(-1) + 0.5) / h], axis=-1
        ).astype(jnp.float32)
        out = []
        chunk = 1 << 17
        params = self.inference_params
        uv = np.asarray(uv)
        n = uv.shape[0]
        n_pad = (n + chunk - 1) // chunk * chunk
        uv = np.pad(uv, ((0, n_pad - n), (0, 0)))
        for i in range(0, n_pad, chunk):
            out.append(np.asarray(self._jit_infer(params, jnp.asarray(uv[i : i + chunk]))))
        return np.concatenate(out)[:n].reshape(h, w, 3)

    def compute_mse(self, quantize_to_byte: bool = False) -> float:
        """Reference compute_image_mse (testbed_image.cu:490-547):
        snap-to-pixel-centers targets vs predictions over all pixels."""
        w, h = self.resolution
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        uv = np.stack([(xs.reshape(-1) + 0.5) / w, (ys.reshape(-1) + 0.5) / h], -1).astype(
            np.float32
        )
        params = self.inference_params
        total = 0.0
        chunk = 1 << 17
        n = uv.shape[0]
        n_pad = (n + chunk - 1) // chunk * chunk
        uv = np.pad(uv, ((0, n_pad - n), (0, 0)))
        done = 0
        for i in range(0, n_pad, chunk):
            uv_c = jnp.asarray(uv[i : i + chunk])
            target = np.asarray(self._targets_at(uv_c))
            pred = np.asarray(self._jit_infer(params, uv_c))
            if quantize_to_byte:
                pred = np.floor(np.clip(pred, 0, 1) * 255.0 + 0.5) / 255.0
            take = min(chunk, n - done)
            total += float(np.sum((pred[:take] - target[:take]) ** 2))
            done += take
        return total / (w * h * 3)
