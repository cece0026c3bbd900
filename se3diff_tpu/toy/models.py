"""Toy SO(3) score model and IGSO(3)-mixture SDE (the se3diff prototype).

TPU-native counterpart of `se3diff/models.py`: a small MLP score network on
SO(3) and a mixture-of-IGSO(3) data distribution used to validate the whole
diffusion/fine-tuning stack end-to-end with known ground truth.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from se3diff_tpu.models.dig import SinusoidalPositionEmbedder
from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.sde.so3_sde import DiGSO3SDE


class ScoreNet(nn.Module):
    """MLP score net: rotvec embed + sinusoidal time embed -> 3-vector score
    (se3diff/models.py:9-61)."""

    rot_embed_dim: int = 32
    time_embed_dim: int = 32
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, rot_mat: jax.Array, t: jax.Array) -> jax.Array:
        rot_vec = so3_ops.rotmat_to_rotvec(rot_mat)  # [B, 3]
        rot_emb = nn.Dense(self.rot_embed_dim, name="rot_embed")(rot_vec)
        rot_emb = nn.LayerNorm(name="rot_ln")(rot_emb)
        rot_emb = nn.relu(rot_emb)
        t_emb = SinusoidalPositionEmbedder(self.time_embed_dim, name="time_embed")(t)
        t_emb = jnp.broadcast_to(t_emb, (*rot_emb.shape[:-1], self.time_embed_dim))
        x = jnp.concatenate([rot_emb, t_emb], axis=-1)
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(x))
        return nn.Dense(3, name="fc3")(x)


class DiGMixSO3SDE(DiGSO3SDE):
    """DiGSO3SDE whose data distribution is a mixture of IGSO(3) components
    (se3diff/models.py:64-89)."""

    def sample_multiple_igso3(
        self,
        key: jax.Array,
        mus: jax.Array,  # [K, 3, 3]
        sigmas: jax.Array,  # [K]
        weights: jax.Array,  # [K]
        num_samples: int,
    ) -> jax.Array:
        """Draw ``x0 = mu_k @ IGSO3(I, sigma_k)`` with ``k ~ Cat(weights)``."""
        key_k, key_r = jax.random.split(key)
        k = jax.random.categorical(
            key_k, jnp.log(weights + 1e-12), shape=(num_samples,)
        )
        sigma = sigmas[k]  # [B]
        mu = mus[k]  # [B, 3, 3]
        r = self.sample_igso3(key_r, sigma)  # [B, 3, 3]
        return jnp.einsum("...ij,...jk->...ik", mu, r)
