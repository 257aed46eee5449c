"""Quantized decode path tests (interpret-mode Pallas on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.kernels.quant_matmul import (
    quantize_weight,
    quantized_matmul,
    quantized_matmul_reference,
)
from infinisst_tpu.models import llama as L
from infinisst_tpu.models.quant import mm, quantize_llama_params
from infinisst_tpu.streaming.state import init_decoder_state


def test_quantized_matmul_interpret():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (256, 512)) * 0.05
    wq, sc = quantize_weight(w)
    y = jax.random.normal(jax.random.fold_in(k, 1), (4, 256))
    ref = quantized_matmul_reference(y, wq, sc)
    out = quantized_matmul(y, wq, sc, tile_o=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2,
    )


@pytest.mark.slow
def test_quantized_decode_close_to_fp():
    """int8 weight-only decode logits stay close to full precision (128-
    multiple dims so the real kernel path shapes are exercised; interpret
    mode through mm via monkeypatching is avoided by comparing the
    reference dequant matmul)."""
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=32, rope_scaling=False,
    )
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llama_params(params)

    # replace the pallas kernel with its jnp reference for CPU testing
    import infinisst_tpu.models.quant as Q

    orig = Q.quantized_matmul
    Q.quantized_matmul = (
        lambda y, w, s, interpret=False: quantized_matmul_reference(y, w, s)
    )
    try:
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 9), 0, 256)
        x = L.embed(params, toks)
        st = init_decoder_state(2, 1, 32, 4, 32, dtype=jnp.float32)
        full, _ = L.decode_step(params, cfg, st, x)
        st2 = init_decoder_state(2, 1, 32, 4, 32, dtype=jnp.float32)
        quant, _ = L.decode_step(qparams, cfg, st2, x)
    finally:
        Q.quantized_matmul = orig

    f = np.asarray(full, np.float32)
    q = np.asarray(quant, np.float32)
    # logits track closely; ranking of the top token is stable
    rel = np.abs(f - q).max() / (np.abs(f).max() + 1e-9)
    assert rel < 0.08, rel
    np.testing.assert_array_equal(f.argmax(-1), q.argmax(-1))


def test_quantized_matmul_w8a8_interpret():
    from infinisst_tpu.kernels.quant_matmul import (
        quantized_matmul_w8a8,
        quantized_matmul_w8a8_reference,
    )

    k = jax.random.PRNGKey(2)
    w = jax.random.normal(k, (256, 512)) * 0.05
    wq, sc = quantize_weight(w)
    y = jax.random.normal(jax.random.fold_in(k, 1), (4, 256))
    ref = quantized_matmul_w8a8_reference(y, wq, sc)
    out = quantized_matmul_w8a8(y, wq, sc, tile_o=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2,
    )
    # W8A8 must also track the fp matmul (both quant errors combined)
    full = np.asarray(y @ w, np.float32)
    got = np.asarray(out, np.float32)
    rel = np.abs(full - got).max() / (np.abs(full).max() + 1e-9)
    assert rel < 0.05, rel


def test_mm_dispatch_w8a8():
    """mm() routes {'q','scale_a8'} through the XLA-native W8A8 path,
    matching the int32-accumulate reference exactly."""
    from infinisst_tpu.kernels.quant_matmul import (
        quantized_matmul_w8a8_reference,
    )

    k = jax.random.PRNGKey(3)
    w = jax.random.normal(k, (128, 256)) * 0.05
    wq, sc = quantize_weight(w)
    y = jax.random.normal(jax.random.fold_in(k, 1), (2, 3, 128))

    out = mm(y, {"q": wq, "scale_a8": sc})
    ref = quantized_matmul_w8a8_reference(
        y.reshape(-1, 128), wq, sc
    ).reshape(2, 3, 256)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-5,
    )
    assert out.shape == (2, 3, 256)


def test_quantize_llama_params_modes():
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=32, rope_scaling=False,
    )
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    q1 = quantize_llama_params(params, act_int8=True, quantize_lm_head=True)
    assert "scale_a8" in q1["layers"]["wq"]
    assert "scale_a8" in q1["lm_head"]
    # vocab padded to a 512 multiple with zeroed pad scales
    assert q1["lm_head"]["q"].shape[-1] % 512 == 0
    q2 = quantize_llama_params(params)
    assert "scale" in q2["layers"]["wq"] and "scale_a8" not in q2["layers"]["wq"]


def test_grouped_w8a8_matches_fp_closely():
    """group_size=128 W8A8: per-(group, out-channel) weight scales +
    per-(row, group) activation scales must (a) run through the llama
    decode path, (b) approximate fp at least as well as per-channel W8A8
    on outlier-heavy weights."""
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=128, rope_scaling=False,
    )
    k = jax.random.PRNGKey(0)
    params = L.init_params(k, cfg)
    # inject per-group outliers so the finer scales matter
    ly = dict(params["layers"])
    w = ly["w_up"]
    boost = jnp.where(
        (jnp.arange(w.shape[1]) // 128 % 2 == 0)[None, :, None], 8.0, 1.0
    )
    ly["w_up"] = w * boost
    params = dict(params, layers=ly)

    qc = quantize_llama_params(params, quantize_lm_head=True, act_int8=True)
    qg = quantize_llama_params(
        params, quantize_lm_head=True, act_int8=True, group_size=128
    )

    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 7), 0, 256)
    x = L.embed(params, toks)

    def run(p):
        st = init_decoder_state(2, 1, 16, 2, 128, dtype=jnp.float32)
        lg, _ = L.decode_step(p, cfg, st, x)
        return np.asarray(lg, np.float32)

    full = run(params)
    err_c = np.abs(run(qc) - full).mean()
    err_g = np.abs(run(qg) - full).mean()
    assert err_g <= err_c * 1.05, (err_g, err_c)
    assert err_g < np.abs(full).std()  # sane overall error


def test_init_quantized_llama_group_shapes():
    """Grouped random-init layout matches the quantize_llama_params
    layout (scale ndim selects the mm dispatch) and runs decode.
    The hybrid belt default groups projections but keeps the lm_head
    per-channel; an explicit head_group_size groups the head too."""
    from infinisst_tpu.models.quant import init_quantized_llama

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=128, rope_scaling=False,
    )
    p = init_quantized_llama(
        jax.random.PRNGKey(0), cfg, act_int8=True, lm_head_int8=True,
        group_size=128,
    )
    assert p["layers"]["wq"]["scale_a8"].shape == (2, 2, 256)
    assert p["lm_head"]["scale_a8"].shape == (512,)  # per-channel head
    p_gh = init_quantized_llama(
        jax.random.PRNGKey(0), cfg, act_int8=True, lm_head_int8=True,
        group_size=128, head_group_size=128,
    )
    assert p_gh["lm_head"]["scale_a8"].shape == (2, 512)
    params = {"embed": p["embed"], "layers": p["layers"],
              "final_ln": p["final_ln"], "lm_head": p["lm_head"]}
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 5), 0, 256)
    st = init_decoder_state(2, 1, 8, 2, 128, dtype=jnp.bfloat16)
    lg, _ = L.decode_step(params, cfg, st, L.embed(params, toks))
    assert np.isfinite(np.asarray(lg, np.float32)).all()


def test_quantized_matmul_w8a8_grouped_interpret():
    """Pallas grouped-W8A8 kernel == the XLA einsum reference, exactly the
    same int8 arithmetic (the quality-belt decode path, models/quant.mm)."""
    from infinisst_tpu.kernels.quant_matmul import (
        quantized_matmul_w8a8_grouped,
        quantized_matmul_w8a8_grouped_reference,
    )

    k = jax.random.PRNGKey(3)
    M, D, O, gs = 5, 256, 384, 64
    y = jax.random.normal(k, (M, D), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (D, O), jnp.float32)
    wg = w.reshape(D // gs, gs, O)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), 1e-8) / 127.0
    wq = jnp.clip(
        jnp.round(wg / s[:, None, :]), -127, 127
    ).astype(jnp.int8).reshape(D, O)

    ref = quantized_matmul_w8a8_grouped_reference(y, wq, s)
    out = quantized_matmul_w8a8_grouped(y, wq, s, tile_o=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )
    # and the (M, O) shape survives M not divisible by the tile
    assert out.shape == (M, O)
