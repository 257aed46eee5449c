"""Independent encoder-numerics parity against HF ``Wav2Vec2Model``.

The other w2v2 "torch parity" tests (tests/test_convert.py) compare against
torch chains authored inside the tests themselves — they share this repo's
reading of fairseq semantics, so they catch transcription bugs but not
misreadings.  Here the authority is ``transformers.Wav2Vec2Model`` with
``do_stable_layer_norm=True, feat_extract_norm='layer'`` — HF's independent
implementation of the exact architecture of the LV-60 "vox" checkpoints the
reference loads (ref: model/speech_encoder.py:147-172; streaming semantics
being mirrored: model/patches/patch_speech_encoder.py:228-554).

One synthetic fairseq-keyed state dict is converted BOTH ways:
  convert_w2v2            -> our param pytree  -> models.wav2vec2 forward
  fairseq_w2v2_to_hf      -> HF state dict     -> Wav2Vec2Model forward
and the outputs must agree at every stage:

  1. conv extractor + post-LN + projection (full extractor stack,
     incl. the conv biases the vox checkpoints carry),
  2. the full offline encoder (all layers + final LN) under identical
     injected sinusoidal positions (HF's pos_conv is zeroed — the
     reference's patch REPLACES fairseq's positional conv, see
     patch_speech_encoder.py:448-494, so positions are out of scope
     for the authority check),
  3. the block-causal training mask semantics: HF layers driven with our
     additive mask == our offline forward with the same block size,
  4. streaming: our chunk_step ring-cache stream == the HF block-masked
     offline output (streaming≡offline against the independent authority,
     not against ourselves).

This discovered a real bug on landing: conv biases were silently dropped
(models/wav2vec2.py applied none; convert_w2v2 never read ``.0.bias``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from infinisst_tpu.convert.from_torch import (  # noqa: E402
    convert_w2v2,
    fairseq_w2v2_to_hf,
    to_jax,
)
from infinisst_tpu.core import masks as M  # noqa: E402
from infinisst_tpu.core.config import W2V2Config, conv_cfg  # noqa: E402
from infinisst_tpu.models import wav2vec2 as W  # noqa: E402
from infinisst_tpu.streaming.state import init_encoder_state  # noqa: E402

# Small but structurally faithful: 3 conv layers WITH biases + per-layer LN
# ('layer_norm' extractor mode), 3 pre-LN encoder layers, final LN.
CFG = W2V2Config(
    conv_layers=conv_cfg([(32, 10, 5), (32, 3, 2), (32, 3, 2)]),
    conv_bias=True,
    extractor_mode="layer_norm",
    encoder_embed_dim=64,
    encoder_layers=3,
    encoder_attention_heads=4,
    encoder_ffn_embed_dim=128,
    use_rope=False,  # abs-pos mode: positions injectable on both sides
)
# conv stack: receptive field 40, total stride 20
CONV_RF, CONV_STRIDE = 40, 20


def _fairseq_sd(seed=0):
    """Random fairseq-keyed state dict for CFG (numpy, torch orientation)."""
    rng = np.random.RandomState(seed)

    def r(*shape):
        return (rng.randn(*shape) * 0.08).astype(np.float32)

    sd = {}
    in_d = 1
    for i, lc in enumerate(CFG.conv_layers):
        b = f"feature_extractor.conv_layers.{i}"
        sd[f"{b}.0.weight"] = r(lc.dim, in_d, lc.kernel)  # (out, in, k)
        sd[f"{b}.0.bias"] = r(lc.dim)
        sd[f"{b}.2.1.weight"] = 1.0 + r(lc.dim)
        sd[f"{b}.2.1.bias"] = r(lc.dim)
        in_d = lc.dim
    cd = CFG.conv_layers[-1].dim
    D, F = CFG.encoder_embed_dim, CFG.encoder_ffn_embed_dim
    sd["layer_norm.weight"] = 1.0 + r(cd)
    sd["layer_norm.bias"] = r(cd)
    sd["post_extract_proj.weight"] = r(D, cd)
    sd["post_extract_proj.bias"] = r(D)
    for i in range(CFG.encoder_layers):
        e = f"encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{e}.self_attn.{name}.weight"] = r(D, D)
            sd[f"{e}.self_attn.{name}.bias"] = r(D)
        for name in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{e}.{name}.weight"] = 1.0 + r(D)
            sd[f"{e}.{name}.bias"] = r(D)
        sd[f"{e}.fc1.weight"] = r(F, D)
        sd[f"{e}.fc1.bias"] = r(F)
        sd[f"{e}.fc2.weight"] = r(D, F)
        sd[f"{e}.fc2.bias"] = r(D)
    sd["encoder.layer_norm.weight"] = 1.0 + r(D)
    sd["encoder.layer_norm.bias"] = r(D)
    return sd


def _hf_model(sd):
    """Load the fairseq dict into HF's stable-layer-norm Wav2Vec2Model."""
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32,
        hidden_size=CFG.encoder_embed_dim,
        num_hidden_layers=CFG.encoder_layers,
        num_attention_heads=CFG.encoder_attention_heads,
        intermediate_size=CFG.encoder_ffn_embed_dim,
        conv_dim=tuple(l.dim for l in CFG.conv_layers),
        conv_kernel=tuple(l.kernel for l in CFG.conv_layers),
        conv_stride=tuple(l.stride for l in CFG.conv_layers),
        num_feat_extract_layers=len(CFG.conv_layers),
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        hidden_act="gelu",
        feat_extract_activation="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
        layer_norm_eps=1e-5,
    )
    model = transformers.Wav2Vec2Model(hf_cfg).eval()
    mapped = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in fairseq_w2v2_to_hf(
            sd, len(CFG.conv_layers), CFG.encoder_layers
        ).items()
    }
    missing, unexpected = model.load_state_dict(mapped, strict=False)
    assert not unexpected, unexpected
    allowed = ("encoder.pos_conv_embed.", "masked_spec_embed")
    assert all(m.startswith(allowed) for m in missing), missing
    # The reference's patch REPLACES fairseq's positional conv with RoPE /
    # sinusoidal positions; neutralise HF's pos_conv (zero the weight-norm
    # magnitude + bias; the direction stays nonzero to avoid 0/0).
    with torch.no_grad():
        for n, p in model.encoder.pos_conv_embed.named_parameters():
            if "original1" in n or n.endswith("weight_v"):
                continue
            p.zero_()
    hid = model.encoder.pos_conv_embed(torch.zeros(1, 8, CFG.encoder_embed_dim))
    assert float(hid.abs().max()) == 0.0
    return model


def _sinusoid(F):
    return np.asarray(W.sinusoidal_positions(0, F, CFG.encoder_embed_dim))


def _hf_encode(model, wave_np, attn_bias=None):
    """HF forward with positions injected explicitly.

    extractor -> projection -> (+ sinusoid) -> encoder layers (optionally
    under an additive block mask) -> final LN.  With attn_bias=None this
    equals model(wave).last_hidden_state + the sinusoid path (pos_conv is
    zeroed), but driving the modules keeps the mask injectable.
    """
    with torch.no_grad():
        x = torch.from_numpy(wave_np)
        feats = model.feature_extractor(x).transpose(1, 2)
        hidden, _ = model.feature_projection(feats)
        F = hidden.shape[1]
        hidden = hidden + torch.from_numpy(_sinusoid(F))[None]
        for layer in model.encoder.layers:
            hidden = layer(hidden, attention_mask=attn_bias)[0]
        hidden = model.encoder.layer_norm(hidden)
    return hidden.numpy(), feats.numpy()


@pytest.fixture(scope="module")
def setup():
    sd = _fairseq_sd()
    ours = to_jax(convert_w2v2(sd, CFG))
    hf = _hf_model(sd)
    rng = np.random.RandomState(7)
    wave = (rng.randn(2, 39 + 64 * CONV_STRIDE) * 0.2).astype(np.float32)
    return sd, ours, hf, wave


def test_extractor_and_projection_parity(setup):
    _, ours, hf, wave = setup
    mine = np.asarray(W._prep_frames(ours, CFG, jnp.asarray(wave)))
    with torch.no_grad():
        feats = hf.feature_extractor(torch.from_numpy(wave)).transpose(1, 2)
        proj, _ = hf.feature_projection(feats)
    assert mine.shape == tuple(proj.shape)
    np.testing.assert_allclose(mine, proj.numpy(), atol=2e-5, rtol=1e-4)


def test_conv_bias_is_live(setup):
    """Guard against regressing to the silent-bias-drop bug: zeroing the
    converted conv biases must change the extractor output."""
    sd, ours, _, wave = setup
    assert all("b" in layer for layer in ours["conv"])
    nob = dict(ours, conv=[dict(l, b=jnp.zeros_like(l["b"]))
                           for l in ours["conv"]])
    a = np.asarray(W._prep_frames(ours, CFG, jnp.asarray(wave)))
    b = np.asarray(W._prep_frames(nob, CFG, jnp.asarray(wave)))
    assert np.abs(a - b).max() > 1e-3


def test_full_stack_offline_parity(setup):
    """All encoder layers + final LN vs HF, bidirectional attention."""
    _, ours, hf, wave = setup
    hf_out, _ = _hf_encode(hf, wave)
    mine = np.asarray(
        W.forward(ours, CFG, jnp.asarray(wave),
                  block_frames=10**6, max_cache_frames=10**6)
    )
    assert mine.shape == hf_out.shape
    np.testing.assert_allclose(mine, hf_out, atol=2e-4, rtol=1e-3)


def test_block_causal_mask_parity(setup):
    """Our training block mask, applied to HF's attention, reproduces our
    block-masked offline forward: validates mask semantics against an
    implementation that did not author the mask."""
    _, ours, hf, wave = setup
    F = 64
    blk = 16
    mask = np.asarray(M.block_causal_mask(F, 10**6, blk))
    bias = torch.where(
        torch.from_numpy(mask)[None, None],
        torch.tensor(0.0), torch.tensor(torch.finfo(torch.float32).min),
    )
    hf_out, _ = _hf_encode(hf, wave, attn_bias=bias)
    mine = np.asarray(
        W.forward(ours, CFG, jnp.asarray(wave),
                  block_frames=blk, max_cache_frames=10**6)
    )
    np.testing.assert_allclose(mine, hf_out, atol=2e-4, rtol=1e-3)


def test_streaming_matches_hf_blockwise_offline(setup):
    """chunk_step ring-cache streaming == HF block-masked offline output.

    The streaming≡offline invariant, measured against the independent
    implementation rather than our own offline path."""
    _, ours, hf, wave = setup
    B = wave.shape[0]
    chunk_frames = 16
    chunk_samples = chunk_frames * CONV_STRIDE
    n_chunks = 4
    F = n_chunks * chunk_frames  # 64 frames total (matches wave length)

    mask = np.asarray(M.block_causal_mask(F, 10**6, chunk_frames))
    bias = torch.where(
        torch.from_numpy(mask)[None, None],
        torch.tensor(0.0), torch.tensor(torch.finfo(torch.float32).min),
    )
    hf_out, _ = _hf_encode(hf, wave, attn_bias=bias)

    C = 256  # ring capacity > total frames: no eviction in this test
    state = init_encoder_state(
        CFG.encoder_layers, B, C,
        CFG.encoder_attention_heads, CFG.head_dim, jnp.float32,
    )
    # rolling raw window: (RF - 1) left-context samples + 2 chunks.  The
    # wave's first RF-1 samples are real signal the offline pass consumes
    # directly, so the stream replays them as chunk 0's left context:
    # window_i = the last (RF-1 + 2*cs) samples of wave[:, :RF-1+(i+1)*cs],
    # zero-left-padded while the stream is shorter than the window.
    win = np.zeros((B, (CONV_RF - 1) + 2 * chunk_samples), np.float32)
    outs = []
    for i in range(n_chunks):
        upto = (CONV_RF - 1) + (i + 1) * chunk_samples
        seg = wave[:, :upto]
        if seg.shape[1] >= win.shape[1]:
            win = seg[:, -win.shape[1]:]
        else:
            win = np.concatenate(
                [np.zeros((B, win.shape[1] - seg.shape[1]), np.float32), seg],
                axis=1,
            )
        out, state = W.chunk_step(
            ours, CFG, state, jnp.asarray(win), chunk_frames, 10**6
        )
        outs.append(np.asarray(out))
    mine = np.concatenate(outs, axis=1)
    assert mine.shape == hf_out.shape
    np.testing.assert_allclose(mine, hf_out, atol=3e-4, rtol=1e-3)
