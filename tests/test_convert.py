"""Converter + numerics parity tests against torch/HF references:

1. tiny HF LlamaForCausalLM -> convert_llama -> our offline_forward must
   match HF logits (validates GQA, RoPE convention, RMSNorm, SiLU MLP).
2. conv frontend parity vs a torch Conv1d+LayerNorm+GELU chain (validates
   VALID padding, stride semantics, exact-GELU).
3. fairseq-style key mapping round trip (shapes + orientation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinisst_tpu.convert import from_torch as C
from infinisst_tpu.core.config import LlamaConfig, W2V2Config, conv_cfg
from infinisst_tpu.models import llama as L
from infinisst_tpu.models import wav2vec2 as W

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_llama_parity_vs_hf():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_theta=500000.0,
        rope_scaling=False,
    )
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    params = C.to_jax(C.convert_llama(sd, cfg))

    ids = np.random.RandomState(0).randint(0, 128, (2, 11))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()

    x = L.embed(params, jnp.asarray(ids))
    ours = np.asarray(L.offline_forward(params, cfg, x))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    # incremental path must agree too
    from infinisst_tpu.streaming.state import init_decoder_state

    st = init_decoder_state(2, 2, 32, 2, 16, dtype=jnp.float32)
    lg1, st = L.decode_step(params, cfg, st, x[:, :6])
    lg2, st = L.decode_step(params, cfg, st, x[:, 6:])
    inc = np.concatenate([np.asarray(lg1), np.asarray(lg2)], axis=1)
    np.testing.assert_allclose(inc, ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_llama31_rope_scaling_parity():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    rope_scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 64,
    }
    hf_cfg = HFConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=1,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        rope_scaling=rope_scaling,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_layers=1,
        num_heads=2,
        num_kv_heads=1,
        head_dim=16,
        rope_theta=500000.0,
        rope_scaling=True,
        rope_scaling_factor=8.0,
        rope_low_freq_factor=1.0,
        rope_high_freq_factor=4.0,
        rope_original_max_position=64,
    )
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    params = C.to_jax(C.convert_llama(sd, cfg))
    ids = np.random.RandomState(1).randint(0, 96, (1, 100))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(
        L.offline_forward(params, cfg, L.embed(params, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-3)


def test_conv_frontend_parity_vs_torch():
    """Our conv extractor vs torch Conv1d + LayerNorm + exact GELU."""
    cfg = W2V2Config(
        conv_layers=conv_cfg([(8, 10, 5), (8, 3, 2)]),
        encoder_embed_dim=16,
        encoder_layers=1,
        encoder_attention_heads=2,
        encoder_ffn_embed_dim=32,
    )
    rng = np.random.RandomState(0)
    sd = {}
    in_d = 1
    tmods = []
    for i, lc in enumerate(cfg.conv_layers):
        wkey = f"feature_extractor.conv_layers.{i}.0.weight"
        sd[wkey] = rng.randn(lc.dim, in_d, lc.kernel).astype(np.float32) * 0.3
        sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = rng.rand(
            lc.dim
        ).astype(np.float32)
        sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = rng.randn(
            lc.dim
        ).astype(np.float32) * 0.1
        in_d = lc.dim
    # unused-by-conv params for the full converter path:
    D = cfg.encoder_embed_dim
    sd["layer_norm.weight"] = np.ones(8, np.float32)
    sd["layer_norm.bias"] = np.zeros(8, np.float32)
    sd["post_extract_proj.weight"] = rng.randn(D, 8).astype(np.float32) * 0.1
    sd["post_extract_proj.bias"] = np.zeros(D, np.float32)
    for nm in ["self_attn_layer_norm", "final_layer_norm"]:
        sd[f"encoder.layers.0.{nm}.weight"] = np.ones(D, np.float32)
        sd[f"encoder.layers.0.{nm}.bias"] = np.zeros(D, np.float32)
    for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        sd[f"encoder.layers.0.self_attn.{nm}.weight"] = (
            rng.randn(D, D).astype(np.float32) * 0.1
        )
        sd[f"encoder.layers.0.self_attn.{nm}.bias"] = np.zeros(D, np.float32)
    sd["encoder.layers.0.fc1.weight"] = rng.randn(32, D).astype(np.float32) * 0.1
    sd["encoder.layers.0.fc1.bias"] = np.zeros(32, np.float32)
    sd["encoder.layers.0.fc2.weight"] = rng.randn(D, 32).astype(np.float32) * 0.1
    sd["encoder.layers.0.fc2.bias"] = np.zeros(D, np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(D, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(D, np.float32)

    params = C.to_jax(C.convert_w2v2(sd, cfg))

    x = rng.randn(1, 64).astype(np.float32)
    ours = np.asarray(W.conv_extractor(params, cfg, jnp.asarray(x)))

    # torch reference chain
    h = torch.tensor(x).unsqueeze(1)
    in_d = 1
    for i, lc in enumerate(cfg.conv_layers):
        conv = torch.nn.Conv1d(in_d, lc.dim, lc.kernel, lc.stride, bias=False)
        conv.weight.data = torch.tensor(
            sd[f"feature_extractor.conv_layers.{i}.0.weight"]
        )
        ln = torch.nn.LayerNorm(lc.dim)
        ln.weight.data = torch.tensor(
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"]
        )
        ln.bias.data = torch.tensor(
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"]
        )
        with torch.no_grad():
            h = conv(h)
            h = ln(h.transpose(1, 2)).transpose(1, 2)
            h = torch.nn.functional.gelu(h)
        in_d = lc.dim
    ref = h.transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_export_roundtrip():
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=16, rope_scaling=False,
    )
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    sd = C.export_llama(params, cfg)
    back = C.to_jax(C.convert_llama(sd, cfg))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _tiny_w2v2_sd(rng, cfg):
    """Synthesize a bare-SSL fairseq state dict for ``cfg``."""
    sd = {}
    in_d = 1
    for i, lc in enumerate(cfg.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = (
            rng.randn(lc.dim, in_d, lc.kernel).astype(np.float32) * 0.3
        )
        sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = rng.rand(
            lc.dim
        ).astype(np.float32)
        sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = (
            rng.randn(lc.dim).astype(np.float32) * 0.1
        )
        in_d = lc.dim
    D = cfg.encoder_embed_dim
    F = cfg.encoder_ffn_embed_dim
    sd["layer_norm.weight"] = np.ones(in_d, np.float32)
    sd["layer_norm.bias"] = np.zeros(in_d, np.float32)
    sd["post_extract_proj.weight"] = rng.randn(D, in_d).astype(np.float32) * 0.1
    sd["post_extract_proj.bias"] = np.zeros(D, np.float32)
    for li in range(cfg.encoder_layers):
        for nm in ["self_attn_layer_norm", "final_layer_norm"]:
            sd[f"encoder.layers.{li}.{nm}.weight"] = np.ones(D, np.float32)
            sd[f"encoder.layers.{li}.{nm}.bias"] = np.zeros(D, np.float32)
        for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            sd[f"encoder.layers.{li}.self_attn.{nm}.weight"] = (
                rng.randn(D, D).astype(np.float32) * 0.1
            )
            sd[f"encoder.layers.{li}.self_attn.{nm}.bias"] = np.zeros(
                D, np.float32
            )
        sd[f"encoder.layers.{li}.fc1.weight"] = (
            rng.randn(F, D).astype(np.float32) * 0.1
        )
        sd[f"encoder.layers.{li}.fc1.bias"] = np.zeros(F, np.float32)
        sd[f"encoder.layers.{li}.fc2.weight"] = (
            rng.randn(D, F).astype(np.float32) * 0.1
        )
        sd[f"encoder.layers.{li}.fc2.bias"] = np.zeros(D, np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(D, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(D, np.float32)
    return sd


def test_convert_w2v2_ctc_layout():
    """CTC-finetuned checkpoints wrap keys as w2v_encoder.w2v_model.* and
    add a CTC proj head; the converter must auto-strip the wrapper and
    ignore the head (ref: model/speech_encoder.py:157-171)."""
    cfg = W2V2Config(
        conv_layers=conv_cfg([(8, 10, 5), (8, 3, 2)]),
        encoder_embed_dim=16,
        encoder_layers=2,
        encoder_attention_heads=2,
        encoder_ffn_embed_dim=32,
    )
    rng = np.random.RandomState(3)
    sd = _tiny_w2v2_sd(rng, cfg)
    ctc_sd = {f"w2v_encoder.w2v_model.{k}": v for k, v in sd.items()}
    # CTC head + wrapper extras the reference discards
    ctc_sd["w2v_encoder.proj.weight"] = rng.randn(40, 16).astype(np.float32)
    ctc_sd["w2v_encoder.proj.bias"] = np.zeros(40, np.float32)
    ctc_sd["w2v_encoder.w2v_model.mask_emb"] = rng.randn(16).astype(np.float32)

    ssl = C.convert_w2v2(sd, cfg)
    ctc = C.convert_w2v2(ctc_sd, cfg)
    for a, b in zip(jax.tree.leaves(ssl), jax.tree.leaves(ctc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_torch_state_pickle_gating(tmp_path):
    """Plain tensor checkpoints load with weights_only; checkpoints with
    config objects require an explicit allow_pickle=True (restricted
    unpickler) and still yield the tensors."""
    plain = {"w": torch.randn(3, 2)}
    p1 = tmp_path / "plain.pt"
    torch.save(plain, p1)
    out = C.load_torch_state(str(p1))
    assert out["w"].shape == (3, 2)

    import argparse as ap

    fairseq_like = {
        "model": {"x": torch.randn(2, 2)},
        "args": ap.Namespace(encoder_layers=2),
    }
    p2 = tmp_path / "fairseq.pt"
    torch.save(fairseq_like, p2)
    with pytest.raises(ValueError, match="allow_pickle"):
        C.load_torch_state(str(p2))
    out2 = C.load_torch_state(str(p2), allow_pickle=True)
    assert out2["x"].shape == (2, 2)


def test_load_torch_state_legacy_header_pickles_restricted(tmp_path):
    """torch's _legacy_load (non-zip format) calls pickle_module.load(f) on
    three attacker-controlled HEADER pickles before it ever constructs
    pickle_module.Unpickler — the shim's ``load`` must therefore be
    restricted too, or a crafted legacy file executes arbitrary
    ``__reduce__`` code on the exact allow_pickle=True path the fallback
    exists for."""
    import os
    import pickle as pk

    sentinel = tmp_path / "pwned_dir"

    class Evil:
        def __reduce__(self):
            return (os.mkdir, (str(sentinel),))

    # A non-zipfile "checkpoint" whose first (magic-number) pickle carries
    # the payload; unrestricted pickle.load would mkdir the sentinel.
    mal = tmp_path / "legacy_evil.pt"
    mal.write_bytes(pk.dumps(Evil()) + pk.dumps(1001) + pk.dumps({}))

    with pytest.raises(Exception):
        C.load_torch_state(str(mal), allow_pickle=True)
    assert not sentinel.exists(), (
        "legacy-format header pickle executed code through the fallback "
        "loader — the pickle_module.load shim is not restricted"
    )

    # Control: the same bytes through raw pickle.load DO run the payload
    # (proves the file is a genuine exploit vector, not a malformed no-op).
    with open(mal, "rb") as f:
        pk.load(f)
    assert sentinel.exists()


def test_convert_hubert_layout_and_groupnorm_parity():
    """'default' extractor (hubert): conv_layers.0.2.{weight,bias} is a
    GroupNorm(dim, dim); our conv frontend must match the torch chain, and
    the converter must ignore hubert's label_embs/final_proj extras."""
    import dataclasses

    cfg = W2V2Config(
        conv_layers=conv_cfg([(8, 10, 5), (8, 3, 2)]),
        encoder_embed_dim=16,
        encoder_layers=1,
        encoder_attention_heads=2,
        encoder_ffn_embed_dim=32,
        extractor_mode="default",
    )
    rng = np.random.RandomState(7)
    sd = {}
    in_d = 1
    for i, lc in enumerate(cfg.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = (
            rng.randn(lc.dim, in_d, lc.kernel).astype(np.float32) * 0.3
        )
        in_d = lc.dim
    sd["feature_extractor.conv_layers.0.2.weight"] = rng.rand(8).astype(
        np.float32
    )
    sd["feature_extractor.conv_layers.0.2.bias"] = (
        rng.randn(8).astype(np.float32) * 0.1
    )
    D = cfg.encoder_embed_dim
    sd["layer_norm.weight"] = np.ones(8, np.float32)
    sd["layer_norm.bias"] = np.zeros(8, np.float32)
    sd["post_extract_proj.weight"] = rng.randn(D, 8).astype(np.float32) * 0.1
    sd["post_extract_proj.bias"] = np.zeros(D, np.float32)
    for nm in ["self_attn_layer_norm", "final_layer_norm"]:
        sd[f"encoder.layers.0.{nm}.weight"] = np.ones(D, np.float32)
        sd[f"encoder.layers.0.{nm}.bias"] = np.zeros(D, np.float32)
    for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        sd[f"encoder.layers.0.self_attn.{nm}.weight"] = (
            rng.randn(D, D).astype(np.float32) * 0.1
        )
        sd[f"encoder.layers.0.self_attn.{nm}.bias"] = np.zeros(D, np.float32)
    sd["encoder.layers.0.fc1.weight"] = rng.randn(32, D).astype(np.float32) * 0.1
    sd["encoder.layers.0.fc1.bias"] = np.zeros(32, np.float32)
    sd["encoder.layers.0.fc2.weight"] = rng.randn(D, 32).astype(np.float32) * 0.1
    sd["encoder.layers.0.fc2.bias"] = np.zeros(D, np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(D, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(D, np.float32)
    # hubert extras the converter must ignore
    sd["label_embs_concat"] = rng.randn(10, 4).astype(np.float32)
    sd["final_proj.weight"] = rng.randn(4, D).astype(np.float32)
    sd["final_proj.bias"] = np.zeros(4, np.float32)

    params = C.to_jax(C.convert_w2v2(sd, cfg))
    assert "gn_scale" in params["conv"][0] and "w" in params["conv"][1]

    x = rng.randn(1, 64).astype(np.float32)
    ours = np.asarray(W.conv_extractor(params, cfg, jnp.asarray(x)))

    h = torch.tensor(x).unsqueeze(1)
    in_d = 1
    for i, lc in enumerate(cfg.conv_layers):
        conv = torch.nn.Conv1d(in_d, lc.dim, lc.kernel, lc.stride, bias=False)
        conv.weight.data = torch.tensor(
            sd[f"feature_extractor.conv_layers.{i}.0.weight"]
        )
        with torch.no_grad():
            h = conv(h)
            if i == 0:
                gn = torch.nn.GroupNorm(lc.dim, lc.dim)
                gn.weight.data = torch.tensor(
                    sd["feature_extractor.conv_layers.0.2.weight"]
                )
                gn.bias.data = torch.tensor(
                    sd["feature_extractor.conv_layers.0.2.bias"]
                )
                h = gn(h)
            h = torch.nn.functional.gelu(h)
        in_d = lc.dim
    ref = h.transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_w2v2_full_stack_parity_vs_torch():
    """Converted fairseq-layout weights through the FULL encoder (conv
    chain -> post LN -> projection -> pre-LN transformer stack -> final
    LN) must match an independent torch implementation numerically.
    Catches orientation/bias/LN-placement bugs that shape-only roundtrips
    (test_convert_w2v2_ctc_layout) cannot.  RoPE off: positions are the
    sinusoidal fallback, added identically on both sides (its formula has
    its own test, test_wav2vec2.test_sinusoidal_positions_formula)."""
    cfg = W2V2Config(
        conv_layers=conv_cfg([(8, 10, 5), (8, 3, 2)]),
        encoder_embed_dim=16,
        encoder_layers=2,
        encoder_attention_heads=2,
        encoder_ffn_embed_dim=32,
        use_rope=False,
    )
    rng = np.random.RandomState(7)
    sd = _tiny_w2v2_sd(rng, cfg)
    # non-trivial biases and LN params everywhere (the shared helper zeros
    # them, which would mask bias-mapping bugs)
    D = cfg.encoder_embed_dim
    F = cfg.encoder_ffn_embed_dim
    sd["layer_norm.weight"] = rng.rand(8).astype(np.float32) + 0.5
    sd["layer_norm.bias"] = rng.randn(8).astype(np.float32) * 0.1
    sd["post_extract_proj.bias"] = rng.randn(D).astype(np.float32) * 0.1
    for li in range(cfg.encoder_layers):
        for nm in ["self_attn_layer_norm", "final_layer_norm"]:
            sd[f"encoder.layers.{li}.{nm}.weight"] = (
                rng.rand(D).astype(np.float32) + 0.5
            )
            sd[f"encoder.layers.{li}.{nm}.bias"] = (
                rng.randn(D).astype(np.float32) * 0.1
            )
        for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            sd[f"encoder.layers.{li}.self_attn.{nm}.bias"] = (
                rng.randn(D).astype(np.float32) * 0.1
            )
        sd[f"encoder.layers.{li}.fc1.bias"] = (
            rng.randn(F).astype(np.float32) * 0.1
        )
        sd[f"encoder.layers.{li}.fc2.bias"] = (
            rng.randn(D).astype(np.float32) * 0.1
        )
    sd["encoder.layer_norm.weight"] = rng.rand(D).astype(np.float32) + 0.5
    sd["encoder.layer_norm.bias"] = rng.randn(D).astype(np.float32) * 0.1

    params = C.to_jax(C.convert_w2v2(sd, cfg))
    x = rng.randn(1, 120).astype(np.float32)
    ours = np.asarray(
        W.forward(params, cfg, jnp.asarray(x), 10**7, 10**7)
    )

    # --- independent torch mirror ---------------------------------------
    h = torch.tensor(x).unsqueeze(1)
    in_d = 1
    for i, lc in enumerate(cfg.conv_layers):
        conv = torch.nn.Conv1d(in_d, lc.dim, lc.kernel, lc.stride, bias=False)
        conv.weight.data = torch.tensor(
            sd[f"feature_extractor.conv_layers.{i}.0.weight"]
        )
        ln = torch.nn.LayerNorm(lc.dim)
        ln.weight.data = torch.tensor(
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"]
        )
        ln.bias.data = torch.tensor(
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"]
        )
        with torch.no_grad():
            h = conv(h)
            h = ln(h.transpose(1, 2)).transpose(1, 2)
            h = torch.nn.functional.gelu(h)
        in_d = lc.dim
    h = h.transpose(1, 2)  # (1, F, 8)

    def t_ln(t, w, b):
        ln = torch.nn.LayerNorm(t.shape[-1])
        ln.weight.data = torch.tensor(sd[w])
        ln.bias.data = torch.tensor(sd[b])
        return ln(t)

    with torch.no_grad():
        h = t_ln(h, "layer_norm.weight", "layer_norm.bias")
        h = h @ torch.tensor(sd["post_extract_proj.weight"]).T + torch.tensor(
            sd["post_extract_proj.bias"]
        )
        # sinusoidal absolute positions (identical formula both sides)
        pos = np.asarray(W.sinusoidal_positions(0, h.shape[1], D))
        h = h + torch.tensor(pos)[None]
        H = cfg.encoder_attention_heads
        hd = D // H
        for li in range(cfg.encoder_layers):
            pre = f"encoder.layers.{li}"
            y = t_ln(
                h, f"{pre}.self_attn_layer_norm.weight",
                f"{pre}.self_attn_layer_norm.bias",
            )

            def proj(t, nm):
                return t @ torch.tensor(
                    sd[f"{pre}.self_attn.{nm}.weight"]
                ).T + torch.tensor(sd[f"{pre}.self_attn.{nm}.bias"])

            S = y.shape[1]
            q = proj(y, "q_proj").view(1, S, H, hd).transpose(1, 2)
            kk = proj(y, "k_proj").view(1, S, H, hd).transpose(1, 2)
            v = proj(y, "v_proj").view(1, S, H, hd).transpose(1, 2)
            att = torch.nn.functional.scaled_dot_product_attention(q, kk, v)
            att = att.transpose(1, 2).reshape(1, S, D)
            att = att @ torch.tensor(
                sd[f"{pre}.self_attn.out_proj.weight"]
            ).T + torch.tensor(sd[f"{pre}.self_attn.out_proj.bias"])
            h = h + att
            y = t_ln(
                h, f"{pre}.final_layer_norm.weight",
                f"{pre}.final_layer_norm.bias",
            )
            y = torch.nn.functional.gelu(
                y @ torch.tensor(sd[f"{pre}.fc1.weight"]).T
                + torch.tensor(sd[f"{pre}.fc1.bias"])
            )
            y = y @ torch.tensor(sd[f"{pre}.fc2.weight"]).T + torch.tensor(
                sd[f"{pre}.fc2.bias"]
            )
            h = h + y
        h = t_ln(h, "encoder.layer_norm.weight", "encoder.layer_norm.bias")
    ref = h.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_adapter_parity_vs_torch():
    """convert_adapter-mapped weights through the length_shrink conv blocks
    + projection vs an independent torch Conv1d/LayerNorm/GELU chain
    (ref block structure: model/speech_encoder.py:18-78, :117-121)."""
    from infinisst_tpu.core.config import AdapterConfig
    from infinisst_tpu.models import adapter as AD

    cfg = AdapterConfig(
        conv_layers=conv_cfg([(12, 2, 2), (12, 2, 2)]), in_dim=12, out_dim=20
    )
    rng = np.random.RandomState(11)
    sd = {}
    in_d = cfg.in_dim
    for i, lc in enumerate(cfg.conv_layers):
        base = f"speech_encoder.length_shrink.conv_layers.{i}"
        sd[f"{base}.0.weight"] = (
            rng.randn(lc.dim, in_d, lc.kernel).astype(np.float32) * 0.3
        )
        sd[f"{base}.2.1.weight"] = rng.rand(lc.dim).astype(np.float32) + 0.5
        sd[f"{base}.2.1.bias"] = rng.randn(lc.dim).astype(np.float32) * 0.1
        in_d = lc.dim
    sd["speech_encoder.proj.weight"] = (
        rng.randn(cfg.out_dim, in_d).astype(np.float32) * 0.2
    )
    sd["speech_encoder.proj.bias"] = rng.randn(cfg.out_dim).astype(
        np.float32
    ) * 0.1

    params = C.to_jax(C.convert_adapter(sd, cfg, "speech_encoder."))
    x = rng.randn(2, 8, cfg.in_dim).astype(np.float32)  # (B, frames, D)
    ours = np.asarray(AD.forward(params, cfg, jnp.asarray(x)))

    h = torch.tensor(x).transpose(1, 2)  # NCW
    in_d = cfg.in_dim
    with torch.no_grad():
        for i, lc in enumerate(cfg.conv_layers):
            base = f"speech_encoder.length_shrink.conv_layers.{i}"
            conv = torch.nn.Conv1d(in_d, lc.dim, lc.kernel, lc.stride,
                                   bias=False)
            conv.weight.data = torch.tensor(sd[f"{base}.0.weight"])
            ln = torch.nn.LayerNorm(lc.dim)
            ln.weight.data = torch.tensor(sd[f"{base}.2.1.weight"])
            ln.bias.data = torch.tensor(sd[f"{base}.2.1.bias"])
            h = conv(h)
            h = ln(h.transpose(1, 2)).transpose(1, 2)
            h = torch.nn.functional.gelu(h)
            in_d = lc.dim
        h = h.transpose(1, 2)
        h = h @ torch.tensor(sd["speech_encoder.proj.weight"]).T + torch.tensor(
            sd["speech_encoder.proj.bias"]
        )
    np.testing.assert_allclose(ours, h.numpy(), atol=1e-5, rtol=1e-4)


def test_reference_bin_layout_roundtrip():
    """convert_reference_bin must consume the pruned stage-2 bin layout
    exactly: llama under HF names, the fairseq body under
    'model.speech_encoder.speech_encoder.', the adapter under
    'model.speech_encoder.length_shrink/proj' (ref: model/model.py:114-133,
    train/prune_bin.py).  Composed from export_llama (whose HF naming is
    itself roundtrip-tested) + the synthetic fairseq sd."""
    from infinisst_tpu.core.config import AdapterConfig, ModelConfig

    w_cfg = W2V2Config(
        conv_layers=conv_cfg([(8, 10, 5), (8, 3, 2)]),
        encoder_embed_dim=16,
        encoder_layers=2,
        encoder_attention_heads=2,
        encoder_ffn_embed_dim=32,
    )
    a_cfg = AdapterConfig(
        conv_layers=conv_cfg([(16, 2, 2), (16, 2, 2)]), in_dim=16, out_dim=24
    )
    l_cfg = LlamaConfig(
        vocab_size=64, hidden_size=24, intermediate_size=40, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=12, rope_scaling=False,
    )
    rng = np.random.RandomState(13)

    w_sd = _tiny_w2v2_sd(rng, w_cfg)
    bin_sd = {
        f"model.speech_encoder.speech_encoder.{k}": v for k, v in w_sd.items()
    }
    in_d = a_cfg.in_dim
    for i, lc in enumerate(a_cfg.conv_layers):
        base = f"model.speech_encoder.length_shrink.conv_layers.{i}"
        bin_sd[f"{base}.0.weight"] = (
            rng.randn(lc.dim, in_d, lc.kernel).astype(np.float32) * 0.3
        )
        bin_sd[f"{base}.2.1.weight"] = rng.rand(lc.dim).astype(np.float32)
        bin_sd[f"{base}.2.1.bias"] = np.zeros(lc.dim, np.float32)
        in_d = lc.dim
    bin_sd["model.speech_encoder.proj.weight"] = (
        rng.randn(a_cfg.out_dim, in_d).astype(np.float32) * 0.2
    )
    bin_sd["model.speech_encoder.proj.bias"] = np.zeros(
        a_cfg.out_dim, np.float32
    )
    l_params = L.init_params(jax.random.PRNGKey(5), l_cfg)
    bin_sd.update(export_llama_np(l_params, l_cfg))

    cfg = ModelConfig(w2v2=w_cfg, adapter=a_cfg, llama=l_cfg)
    full = C.to_jax(C.convert_reference_bin(bin_sd, cfg))

    # each component must equal its individually-converted counterpart
    solo_w = C.to_jax(C.convert_w2v2(w_sd, w_cfg))
    for a, b in zip(jax.tree.leaves(full["w2v2"]), jax.tree.leaves(solo_w)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(full["llama"]), jax.tree.leaves(l_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert full["adapter"]["proj"]["w"].shape == (in_d, a_cfg.out_dim)


def export_llama_np(params, cfg):
    return C.export_llama(params, cfg)
