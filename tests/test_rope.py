"""Encoder RoPE convention tests against an INDEPENDENT mirror of
rotary_embedding_torch's published formulas.

The streaming==offline tests exercise apply_encoder_rope on both sides of
the comparison, so a wrong convention would cancel out there — but it
would silently break compatibility with reference checkpoints (the
reference encoder applies rotary_embedding_torch at attention time,
model/patches/patch_speech_encoder.py:823-824).  Here the expected values
are derived directly from the library's documented convention
(interleaved pairs, freqs repeated [f0, f0, f1, f1, ...], theta=10000
'lang' frequencies), implemented in numpy without touching core/rope.py
helpers.
"""

import jax.numpy as jnp
import numpy as np

from infinisst_tpu.core import rope as R


def _lib_rope(x: np.ndarray, pos: np.ndarray, theta=10000.0):
    """rotary_embedding_torch semantics: out = x*cos(f) + rotate_half(x)*sin(f)
    with f = repeat(pos x inv_freq, '... n -> ... (n 2)') and rotate_half on
    interleaved (d 2) pairs."""
    d = x.shape[-1]
    inv = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    f = pos[:, None].astype(np.float64) * inv[None, :]
    f = np.repeat(f, 2, axis=-1)  # (seq, d)
    rot = np.empty_like(x)
    rot[..., 0::2] = -x[..., 1::2]
    rot[..., 1::2] = x[..., 0::2]
    return x * np.cos(f) + rot * np.sin(f)


def test_encoder_rope_matches_rotary_embedding_torch():
    rng = np.random.RandomState(0)
    d, S = 16, 7
    x = rng.randn(S, d).astype(np.float32)
    pos = np.arange(S).astype(np.int32)
    inv = R.encoder_rope_freqs(d)
    ours = np.asarray(
        R.apply_encoder_rope(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(inv))
    )
    ref = _lib_rope(x.astype(np.float64), pos)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_encoder_rope_relative_property():
    """q(p+c) . k(p'+c) must equal q(p) . k(p') for any shift c — the
    property that makes cache-relative positions (and encoder cache
    eviction) exact rather than approximate."""
    rng = np.random.RandomState(1)
    d = 16
    q = rng.randn(1, d).astype(np.float64)
    k = rng.randn(1, d).astype(np.float64)
    inv = R.encoder_rope_freqs(d)

    def dot(p_q, p_k):
        qr = np.asarray(
            R.apply_encoder_rope(
                jnp.asarray(q), jnp.asarray(np.asarray([p_q], np.int32)),
                jnp.asarray(inv),
            )
        )
        kr = np.asarray(
            R.apply_encoder_rope(
                jnp.asarray(k), jnp.asarray(np.asarray([p_k], np.int32)),
                jnp.asarray(inv),
            )
        )
        return float(qr[0] @ kr[0])

    np.testing.assert_allclose(dot(9, 4), dot(109, 104), rtol=1e-4)
    np.testing.assert_allclose(dot(5, 5), dot(0, 0), rtol=1e-4)


def test_xpos_qk_product_matches_centered_convention():
    """Our xPos scales by r**(pos/base); rotary_embedding_torch centers the
    power at len//2.  The per-vector scales differ, but q.k attention
    scores must be identical (the center cancels between the q upscale and
    k downscale) — that equivalence is what matters for checkpoint
    compatibility."""
    rng = np.random.RandomState(2)
    d, base = 16, 512
    q = rng.randn(1, d).astype(np.float64)
    k = rng.randn(1, d).astype(np.float64)
    inv = R.encoder_rope_freqs(d)
    p_q, p_k, seq_len = 11, 3, 12

    qr = np.asarray(
        R.apply_encoder_rope(
            jnp.asarray(q), jnp.asarray(np.asarray([p_q], np.int32)),
            jnp.asarray(inv), xpos_scale_base=base,
        )
    )
    kr = np.asarray(
        R.apply_encoder_rope(
            jnp.asarray(k), jnp.asarray(np.asarray([p_k], np.int32)),
            jnp.asarray(inv), xpos_scale_base=base, xpos_downscale=True,
        )
    )
    ours = float(qr[0] @ kr[0])

    # library mirror: rotate with plain rope, then scale with centered power
    r = ((np.arange(0, d, 2) / d + 0.4) / 1.4).astype(np.float64)
    r = np.repeat(r, 2)

    def lib_scale(p):
        return r ** ((p - seq_len // 2) / base)

    q_lib = _lib_rope(q, np.asarray([p_q])) * lib_scale(p_q)
    k_lib = _lib_rope(k, np.asarray([p_k])) / lib_scale(p_k)
    ref = float(q_lib[0] @ k_lib[0])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
