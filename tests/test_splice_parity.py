"""Speech-splice parity: our patch-mask scatter must produce the same
embedding layout as the reference's header-search splice
(model/llm.py:88-113), which cats [prefix, speech, suffix] between each
user/assistant header pair."""

import numpy as np

import jax
import jax.numpy as jnp

from infinisst_tpu.core.config import tiny_model_config
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer, build_trajectory_prompt
from infinisst_tpu.models import llama as L

from tests.test_agent import small_special_tokens


def reference_splice(embeds, ids, speech, tokens):
    """numpy transcription of SpeechLlamaModel.forward's splice
    (ref: model/llm.py:88-113): for each (user, assistant) header pair,
    replace the span between u_p+3 and a_p-2 with speech features."""
    user_pos = [
        i
        for i in np.where(ids == tokens.user)[0]
        if i > 0 and ids[i - 1] == tokens.start_header
    ]
    assist_pos = [
        i
        for i in np.where(ids == tokens.assistant)[0]
        if i > 0 and ids[i - 1] == tokens.start_header
    ]
    assert len(user_pos) == len(assist_pos)
    filled = embeds.copy()
    index = 0
    out = filled
    for u_p, a_p in zip(user_pos, assist_pos):
        n = a_p - u_p - 5
        out = np.concatenate(
            [out[: u_p + 3], speech[index : index + n], out[a_p - 2 :]],
            axis=0,
        )
        index += n
    return out


def test_patch_mask_splice_matches_reference():
    tokens = small_special_tokens()
    cfg = tiny_model_config(vocab_size=512).replace(tokens=tokens)
    builder = PromptBuilder(StubTokenizer(512, lo=10, hi=400), tokens)

    # two-turn trajectory transcript, 24 speech tokens
    ids, _ = build_trajectory_prompt(
        builder, [["hello world", True], ["out there", True]], 24, 1
    )
    params = L.init_params(jax.random.PRNGKey(0), cfg.llama)
    emb = np.asarray(L.embed(params, jnp.asarray(ids)[None]))[0]
    speech = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (24, cfg.llama.hidden_size))
    )

    ref = reference_splice(emb, ids, speech, tokens)

    # ours: scatter speech at patch positions (speech_llm.offline_forward's
    # splice logic)
    patch_mask = ids == tokens.sp_patch
    rank = np.cumsum(patch_mask) - 1
    ours = emb.copy()
    ours[patch_mask] = speech[rank[patch_mask]]

    # the reference splice preserves sequence length here because the patch
    # span it replaces has exactly the speech length (template invariant)
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)
