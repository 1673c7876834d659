"""3D Vision Transformer with hidden-state taps (MONAI 0.7 ViT semantics,
usage sites dose_pyfer.py:55-67 and oar_transeg.py:79-91).

Reproduced conventions:
- patch embed 'perceptron': non-overlapping 16³ patches flattened in
  (pd, ph, pw, c) order → Linear(patch_dim → hidden); learned position
  embeddings trunc_normal(0.02).
- patch embed 'conv': Conv3d(k=patch, s=patch) + flatten, plus pos embeds.
- transformer block is pre-norm: x += attn(ln(x)); x += mlp(ln(x)); QKV is a
  single bias-free Linear; MLP is Linear→GELU→Linear; final LayerNorm on the
  output (hidden-state taps are pre-final-norm).

TPU notes: the sequence is only (img/16)³ tokens (512 for 128³), so attention
is a handful of MXU matmuls; softmax runs in f32. Q/K/V and MLP matmuls are
batched over tokens and map directly onto the 128×128 systolic array.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.nn import init as tinit
from dose_prediction_tpu.nn.layers import Conv3D, Dense, LayerNorm


def patchify(x: jax.Array, patch: int) -> jax.Array:
    """(N, D, H, W, C) → (N, tokens, patch³·C); token order (gD, gH, gW),
    within-patch feature order (pd, ph, pw, c) — MONAI Rearrange parity."""
    n, d, h, w, c = x.shape
    gd, gh, gw = d // patch, h // patch, w // patch
    x = x.reshape(n, gd, patch, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, gd * gh * gw, patch * patch * patch * c)


def unpatchify_tokens(tokens: jax.Array, grid: Sequence[int]) -> jax.Array:
    """(N, tokens, hidden) → (N, gD, gH, gW, hidden) — the NDHWC analogue of
    the reference proj_feat (dose_pyfer.py:118-122)."""
    n, l, hdim = tokens.shape
    gd, gh, gw = grid
    if l != gd * gh * gw:
        raise ValueError(f"token count {l} != grid {grid}")
    return tokens.reshape(n, gd, gh, gw, hdim)


class Attention(fnn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        nh = self.num_heads
        hd = self.hidden_size // nh
        qkv = Dense(3 * self.hidden_size, use_bias=False, dtype=self.dtype, name="qkv")(x)
        n, l, _ = qkv.shape
        # MONAI layout: the fused axis is (qkv, heads, head_dim)
        qkv = qkv.reshape(n, l, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        from dose_prediction_tpu.core.config import FLAGS, on_tpu

        if FLAGS.use_pallas_attention and on_tpu():
            from dose_prediction_tpu.kernels.attention import fused_attention

            out = fused_attention(q, k, v)
        else:
            scores = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32)
            scores = scores.astype(jnp.float32) * (hd ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum("nhlm,nhmd->nhld", probs, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(n, l, self.hidden_size)
        return Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(out)


class MlpBlock(fnn.Module):
    hidden_size: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        h = Dense(self.mlp_dim, dtype=self.dtype, name="linear1")(x)
        h = ops.gelu(h)
        return Dense(self.hidden_size, dtype=self.dtype, name="linear2")(h)


class TransformerBlock(fnn.Module):
    hidden_size: int
    mlp_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        x = x + Attention(self.hidden_size, self.num_heads, dtype=self.dtype, name="attn")(
            LayerNorm(name="norm1")(x)
        )
        x = x + MlpBlock(self.hidden_size, self.mlp_dim, dtype=self.dtype, name="mlp")(
            LayerNorm(name="norm2")(x)
        )
        return x


class PatchEmbed3D(fnn.Module):
    """Patch embedding + learned position embedding.

    ``trained_grid`` (a framework extension beyond the MONAI ViT, which is
    fixed to its training grid): when set and different from the runtime
    token grid, the learned position embedding is trilinearly resized from
    the trained grid — a checkpoint trained at e.g. 96³ (6³ tokens) can run
    full-volume inference at other sizes without shape-mismatched params
    (standard ViT grid-interpolation practice)."""

    hidden_size: int
    patch_size: int = 16
    pos_embed: str = "perceptron"  # or "conv"
    trained_grid: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        grid = (d // self.patch_size, h // self.patch_size, w // self.patch_size)
        n_tokens = grid[0] * grid[1] * grid[2]
        if self.pos_embed == "perceptron":
            tokens = patchify(x, self.patch_size)
            tokens = Dense(self.hidden_size, kernel_init=tinit.trunc_normal(0.02),
                           dtype=self.dtype, name="proj")(tokens)
        elif self.pos_embed == "conv":
            feat = Conv3D(self.hidden_size, self.patch_size, stride=self.patch_size,
                          padding=0, dtype=self.dtype, name="proj")(x)
            tokens = feat.reshape(n, n_tokens, self.hidden_size)
        else:
            raise ValueError(f"unknown pos_embed {self.pos_embed!r}")
        base = tuple(int(g) for g in self.trained_grid) if self.trained_grid else grid
        pos = self.param("pos_embedding", tinit.trunc_normal(0.02),
                         (1, base[0] * base[1] * base[2], self.hidden_size))
        if base != grid:
            from dose_prediction_tpu.ops.resize import resize3d

            pos = resize3d(pos.reshape(1, *base, self.hidden_size), grid,
                           mode="trilinear", align_corners=True)
            pos = pos.reshape(1, n_tokens, self.hidden_size)
        return tokens + pos.astype(tokens.dtype)


class ViT3D(fnn.Module):
    """Returns (final_normed_tokens, [hidden_states after each block])."""

    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    pos_embed: str = "perceptron"
    # see PatchEmbed3D.trained_grid: run a checkpoint on other volume sizes
    trained_grid: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x) -> Tuple[jax.Array, List[jax.Array]]:
        tokens = PatchEmbed3D(self.hidden_size, self.patch_size, self.pos_embed,
                              trained_grid=self.trained_grid,
                              dtype=self.dtype, name="patch_embedding")(x)
        hidden_states = []
        for i in range(self.num_layers):
            tokens = TransformerBlock(self.hidden_size, self.mlp_dim, self.num_heads,
                                      dtype=self.dtype, name=f"block{i}")(tokens)
            hidden_states.append(tokens)
        tokens = LayerNorm(name="norm")(tokens)
        return tokens, hidden_states
