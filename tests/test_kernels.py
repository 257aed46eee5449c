"""Pallas kernel correctness tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.core import rope as R
from infinisst_tpu.kernels import decode_attention as DA


@pytest.mark.slow
def test_decode_attention_matches_reference():
    B, H, KV, Dh, C = 2, 8, 4, 64, 512
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, H, Dh))
    ck = jax.random.normal(jax.random.fold_in(rng, 1), (B, C, KV, Dh))
    cv = jax.random.normal(jax.random.fold_in(rng, 2), (B, C, KV, Dh))
    valid = jnp.asarray([300, 511], jnp.int32)
    qpos = valid
    inv_freq = jnp.asarray(R.llama_rope_freqs(Dh, scaling=False), jnp.float32)

    ref = DA.decode_attention_reference(q, ck, cv, valid, qpos, inv_freq)
    out = DA.decode_attention(
        q, ck, cv, valid, qpos, inv_freq, tile=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4
    )
