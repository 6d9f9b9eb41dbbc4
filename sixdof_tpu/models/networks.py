"""RefineNet + ScoreNetMultiPair in flax (NHWC, bf16-friendly).

Architectural mirror of the reference networks
(learning/models/refine_network.py:26-93, score_network.py:27-90,
network_modules.py:24-137): shared conv trunk
  c_in -> 64 (7x7 s2) -> 128 (3x3 s2) -> 2x ResBlock(128)
  concat(A,B) 256 -> 2x ResBlock(256) -> 512 (3x3 s2) -> 2x ResBlock(512)
then sinusoidal position embedding over the 20x20=400 tokens and
transformer/attention heads.  use_BN defaults to False at inference (the
back-compat default in predict_pose_refine.py:112), so no norm layers in the
conv trunk.  Attention internals follow torch semantics (packed QKV, post-norm
encoder layer) so published checkpoints convert weight-for-weight
(models/torch_convert.py).

TPU notes: convs/attention run in NHWC with fp32 params; `compute_dtype`
selects bf16 activations (mirroring the reference's AMP autocast,
predict_pose_refine.py:190) — all matmuls land on the MXU in bf16 with fp32
accumulation.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


# He (kaiming) init for every conv in the ReLU trunk.  Flax's default
# lecun_normal under-scales ReLU stacks by ~1/sqrt(2) per layer: through the
# ~13-conv trunk, from-scratch activations shrink to std ~0.04, which the
# unit-scale positional embedding then swamps (tokens ~ PE + tiny signal).
# The refiner survives because its transformer head LayerNorms the tokens;
# the scorer's bare attention + token-mean does not, so its logits stayed
# input-independent no matter how long it trained.  Init-only change:
# torch-converted reference checkpoints overwrite it, forward math unchanged.
_conv_init = nn.initializers.he_normal()


class ConvReLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=True,
            dtype=self.dtype,
            kernel_init=_conv_init,
            name="conv",
        )(x)
        return nn.relu(x)


class ResnetBasicBlock(nn.Module):
    planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                      dtype=self.dtype, kernel_init=_conv_init, name="conv1")(x)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                      dtype=self.dtype, kernel_init=_conv_init, name="conv2")(out)
        return nn.relu(out + identity)


def sinusoidal_position_embedding(max_len, d_model):
    """(1, max_len, d_model) torch-PositionalEmbedding table
    (network_modules.py:115-137)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible self-attention (packed QKV)."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        qkv = nn.Dense(3 * D, use_bias=True, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, H, hd).transpose(0, 2, 1, 3)  # (B,H,N,hd)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(hd)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, use_bias=True, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer (post-norm, relu, ff=512) at eval."""

    d_model: int
    nhead: int
    dim_feedforward: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = MultiheadAttention(self.d_model, self.nhead, dtype=self.dtype, name="self_attn")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + a)
        f = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        f = nn.relu(f)
        f = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(f)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + f)


class ConvTrunk(nn.Module):
    """Shared encodeA/encodeAB trunk; input NHWC."""

    c_in: int = 6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encodeA = [
            ConvReLU(64, 7, 2, dtype=self.dtype),
            ConvReLU(128, 3, 2, dtype=self.dtype),
            ResnetBasicBlock(128, dtype=self.dtype),
            ResnetBasicBlock(128, dtype=self.dtype),
        ]
        self.encodeAB = [
            ResnetBasicBlock(256, dtype=self.dtype),
            ResnetBasicBlock(256, dtype=self.dtype),
            ConvReLU(512, 3, 2, dtype=self.dtype),
            ResnetBasicBlock(512, dtype=self.dtype),
            ResnetBasicBlock(512, dtype=self.dtype),
        ]

    def __call__(self, A, B):
        """A,B: (batch,H,W,c_in) -> (batch, H/8*W/8, 512) tokens."""
        x = jnp.concatenate([A, B], axis=0)
        for layer in self.encodeA:
            x = layer(x)
        bs = A.shape[0]
        a, b = x[:bs], x[bs:]
        ab = jnp.concatenate([a, b], axis=-1)
        for layer in self.encodeAB:
            ab = layer(ab)
        n, h, w, c = ab.shape
        # torch reshapes (B,C,H,W)->(B,C,HW)->(B,HW,C): token i = pixel i in
        # row-major HW order
        return ab.reshape(n, h * w, c)


class RefineNet(nn.Module):
    """(learning/models/refine_network.py:26-93)"""

    c_in: int = 6
    rot_rep: str = "axis_angle"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.trunk = ConvTrunk(self.c_in, dtype=self.dtype)
        self.pe = sinusoidal_position_embedding(400, 512)
        self.trans_encoder = TransformerEncoderLayer(512, 4, 512, dtype=self.dtype)
        # zero-init heads: the unnormalized trunk (use_BN=False) amplifies
        # activations, so a random head starts tanh-saturated with huge
        # gradient norms and training stalls; zero heads start at the loss
        # basin (tanh(0)=0).  Converted/loaded checkpoints replace params
        # wholesale, so inference fidelity is unaffected.
        self.trans_linear = nn.Dense(3, dtype=jnp.float32, kernel_init=nn.initializers.zeros)
        rot_out = 3 if self.rot_rep == "axis_angle" else 6
        self.rot_encoder = TransformerEncoderLayer(512, 4, 512, dtype=self.dtype)
        self.rot_linear = nn.Dense(rot_out, dtype=jnp.float32,
                                   kernel_init=nn.initializers.zeros)

    def __call__(self, A, B):
        tokens = self.trunk(A, B)
        # token count is static under jit; crops >160x160 exceed the 400-row
        # table (reference max_len, network_modules.py:116) so extend on the
        # fly with the same formula instead of a silent broadcast error
        pe = (self.pe if tokens.shape[1] <= self.pe.shape[1]
              else sinusoidal_position_embedding(tokens.shape[1], 512))
        tokens = tokens + jnp.asarray(pe[:, : tokens.shape[1]], dtype=tokens.dtype)
        trans = self.trans_linear(self.trans_encoder(tokens)).mean(axis=1)
        rot = self.rot_linear(self.rot_encoder(tokens)).mean(axis=1)
        return {"trans": trans.astype(jnp.float32), "rot": rot.astype(jnp.float32)}


class ScoreNetMultiPair(nn.Module):
    """(learning/models/score_network.py:27-90)"""

    c_in: int = 6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.trunk = ConvTrunk(self.c_in, dtype=self.dtype)
        self.pe = sinusoidal_position_embedding(400, 512)
        self.att = MultiheadAttention(512, 4, dtype=self.dtype)
        self.att_cross = MultiheadAttention(512, 4, dtype=self.dtype)
        # zero-init score head for the same trainability reason as RefineNet
        self.linear = nn.Dense(1, dtype=jnp.float32, kernel_init=nn.initializers.zeros)

    def extract_feat(self, A, B):
        tokens = self.trunk(A, B)
        # token count is static under jit; crops >160x160 exceed the 400-row
        # table (reference max_len, network_modules.py:116) so extend on the
        # fly with the same formula instead of a silent broadcast error
        pe = (self.pe if tokens.shape[1] <= self.pe.shape[1]
              else sinusoidal_position_embedding(tokens.shape[1], 512))
        tokens = tokens + jnp.asarray(pe[:, : tokens.shape[1]], dtype=tokens.dtype)
        tokens = self.att(tokens)
        return tokens.mean(axis=1)  # (B*L, 512)

    def __call__(self, A, B, L: int):
        """A,B: (B*L,H,W,c_in); returns score logits (B,L)."""
        feats = self.extract_feat(A, B)
        bs = A.shape[0] // L
        x = feats.reshape(bs, L, -1)
        x = self.att_cross(x)
        return {"score_logit": self.linear(x.astype(jnp.float32))[..., 0]}
