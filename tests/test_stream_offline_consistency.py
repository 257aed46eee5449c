"""Full-stack streaming-vs-offline consistency: two chunked
prefill_chunk calls (speech encoder cache + LLM cache + splice) must
reproduce the offline_forward logits over the concatenated transcript —
the end-to-end version of the §4(c) invariant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.core.config import (
    CONV_LEFT_CONTEXT,
    StreamConfig,
    tiny_model_config,
)
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
from infinisst_tpu.models import speech_llm
from infinisst_tpu.streaming.state import (
    RawAudioWindow,
    init_decoder_state,
    init_encoder_state,
)

from tests.test_agent import small_special_tokens, tiny_params


@pytest.mark.slow
def test_two_chunk_prefill_matches_offline():
    tokens = small_special_tokens()
    cfg = tiny_model_config(vocab_size=512).replace(tokens=tokens)
    params = tiny_params()
    builder = PromptBuilder(StubTokenizer(512, lo=10, hi=400), tokens)

    chunk_frames, chunk_samples, max_cache = 48, 48 * 320, 96
    p1 = builder.chunk_prompt(1, first=True)
    p2 = builder.chunk_prompt(1, first=False)

    audio = (
        jax.random.normal(jax.random.PRNGKey(3), (2 * chunk_samples,)) * 0.1
    )

    # --- offline: concatenated transcript + full audio, training mask
    ids = np.concatenate([p1.ids, p2.ids])
    patch_mask = ids == tokens.sp_patch
    full_audio = jnp.concatenate(
        [jnp.zeros((CONV_LEFT_CONTEXT,)), audio]
    )[None]
    offline = speech_llm.offline_forward(
        params, cfg, full_audio, jnp.asarray(ids)[None],
        jnp.asarray(patch_mask)[None], chunk_frames, max_cache,
    )

    # --- streaming: two prefill_chunk calls
    enc = init_encoder_state(
        cfg.w2v2.encoder_layers, 1, max_cache,
        cfg.w2v2.encoder_attention_heads, cfg.w2v2.head_dim, jnp.float32,
    )
    dec = init_decoder_state(
        cfg.llama.num_layers, 1, 256, cfg.llama.num_kv_heads,
        cfg.llama.head_dim, jnp.float32,
    )
    win = RawAudioWindow(CONV_LEFT_CONTEXT + 2 * chunk_samples, chunk_samples)
    state = speech_llm.StreamState(enc, dec)
    outs = []
    for i, prompt in enumerate([p1, p2]):
        w = win.push(
            np.asarray(audio[i * chunk_samples : (i + 1) * chunk_samples])
        )
        logits, state = speech_llm.prefill_chunk(
            params, cfg, state, jnp.asarray(w)[None],
            jnp.asarray(prompt.ids)[None], prompt.patch_start,
            chunk_frames, max_cache,
        )
        outs.append(logits)
    streaming = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(streaming), np.asarray(offline), atol=5e-4, rtol=5e-3
    )
