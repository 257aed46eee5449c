"""The committed real-tokenizer fixture: PromptBuilder's HF-template path
and the suppress-list builder, exercised FROM FILES (round-3 VERDICT
"missing" #3 / next #7).

tests/fixtures/llama31_tokenizer holds a genuine ``tokenizer.json`` (fast
BPE serialization) + ``tokenizer_config.json`` carrying the Llama-3.1
chat-template string (tools/build_tokenizer_fixture.py documents the
transcription provenance).  Unlike test_hf_template.py (in-memory
tokenizer, synthetic templates), everything here goes through
``AutoTokenizer.from_pretrained`` on committed files — the same call the
production CLI makes (agents/cli.py; ref agents/infinisst.py:135-140) —
and the template is the REAL 3.1 one, date preamble and |trim included.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

pytest.importorskip("tokenizers")
from transformers import AutoTokenizer

from infinisst_tpu.agents.cli import build_suppress_list
from infinisst_tpu.core.config import SpecialTokens
from infinisst_tpu.data.template import (
    DEFAULT_SPEECH_PATCH_TOKEN,
    HFTokenizerAdapter,
    PromptBuilder,
    register_special_tokens,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "llama31_tokenizer"
)


@pytest.fixture(scope="module")
def ftok():
    """Load from files + register the 7 extra tokens, exactly the CLI flow
    (agents/cli.py: AutoTokenizer.from_pretrained -> register_special_tokens
    -> HFTokenizerAdapter)."""
    tok = AutoTokenizer.from_pretrained(FIXTURE)
    base = len(tok)
    toks = SpecialTokens(
        bos=tok.convert_tokens_to_ids("<|begin_of_text|>"),
        end_of_text=tok.convert_tokens_to_ids("<|end_of_text|>"),
        eot=tok.convert_tokens_to_ids("<|eot_id|>"),
        eos=tok.convert_tokens_to_ids("<|eot_id|>"),
        start_header=tok.convert_tokens_to_ids("<|start_header_id|>"),
        end_header=tok.convert_tokens_to_ids("<|end_header_id|>"),
        pad=tok.convert_tokens_to_ids("<|finetune_right_pad_id|>"),
        user=tok.convert_tokens_to_ids("user"),
        assistant=tok.convert_tokens_to_ids("assistant"),
        newline2=tok.encode("\n\n", add_special_tokens=False)[0],
        # the 7 extra tokens append in registration order at the vocab end
        # (the real layout: sp_patch == 128256 right after the base vocab,
        # ref agents/alignatt.py:142)
        sp_patch=base,
        sp_start=base + 1,
        sp_end=base + 2,
        latency=(base + 3, base + 4, base + 5, base + 6),
    )
    cfg = SimpleNamespace(
        tokens=toks, llama=SimpleNamespace(vocab_size=base + 16)
    )
    register_special_tokens(tok, cfg)
    return tok, toks


def test_fixture_files_load_and_carry_the_template():
    tok = AutoTokenizer.from_pretrained(FIXTURE)
    assert tok.is_fast  # a genuine tokenizer.json fast load
    with open(os.path.join(FIXTURE, "chat_template.jinja")) as f:
        jinja = f.read()
    assert tok.chat_template == jinja
    # the no-tools path's load-bearing strings are present verbatim
    for needle in (
        "Cutting Knowledge Date: December 2023",
        'date_string = "26 Jul 2024"',
        "<|start_header_id|>' + message['role'] + '<|end_header_id|>",
        "message['content'] | trim + '<|eot_id|>'",
        "{{- bos_token }}",
    ):
        assert needle in tok.chat_template, needle


def test_prompt_builder_from_files_strip_arithmetic(ftok):
    """The real 3.1 template auto-injects the date preamble; the
    later-chunk system strip must remove exactly the rendered system block
    (ref agents/infinisst.py:262-266) at every multiplier."""
    tok, toks = ftok
    adapter = HFTokenizerAdapter(tok)
    b = PromptBuilder(adapter, toks, use_hf_template=True, llama31=True)
    assert b.use_hf_template  # auto-detected from apply_chat_template

    for m in (1, 2, 3, 4):
        first = b.chunk_prompt(m, first=True)
        later = b.chunk_prompt(m, first=False)
        sys_ids = list(b.system_ids(b.system_text(m)))

        # the rendered system block includes the auto-injected preamble
        sys_text = tok.decode(sys_ids)
        assert "Cutting Knowledge Date: December 2023" in sys_text
        assert "Today Date: 26 Jul 2024" in sys_text
        assert sys_ids[0] == toks.bos and sys_ids[-1] == toks.eot
        # exactly one latency token, the right one
        assert sys_ids.count(toks.latency[m - 1]) == 1

        # strip arithmetic: first = system block ++ later
        np.testing.assert_array_equal(first.ids[: len(sys_ids)], sys_ids)
        np.testing.assert_array_equal(first.ids[len(sys_ids):], later.ids)

        # patch geometry: 12*m contiguous single-id patches
        for p in (first, later):
            pos = np.where(p.ids == toks.sp_patch)[0]
            assert len(pos) == 12 * m == p.n_patches
            assert pos[0] == p.patch_start
            assert pos[-1] - pos[0] == 12 * m - 1
        # the later chunk starts at the user header (strip hit the seam)
        assert later.ids[0] == toks.start_header
        assert later.ids[1] == toks.user
        # open assistant header at the end (trailing <|eot_id|> stripped)
        assert first.ids[-1] != toks.eot
        assert toks.assistant in first.ids[-4:]


def test_trim_hazard_documented_by_template(ftok):
    """The real template |trim's message content — whitespace-padded system
    text renders identically to the trimmed text (a divergence a synthetic
    template without |trim would hide)."""
    tok, toks = ftok
    adapter = HFTokenizerAdapter(tok)
    b = PromptBuilder(adapter, toks, use_hf_template=True)
    text = b.system_text(1)
    a = list(b.system_ids(text))
    bb = list(b.system_ids("  " + text + " \n"))
    assert a == bb


def test_suppress_list_from_files(ftok):
    """build_suppress_list over the files-loaded tokenizer: parenthesised
    annotation tokens are banned; specials and plain text are not (ref
    agents/infinisst.py:142-148)."""
    tok, toks = ftok
    adapter = HFTokenizerAdapter(tok)
    bad = build_suppress_list(adapter)
    assert len(bad) > 0
    for idx in bad:
        d = tok.decode([int(idx)], skip_special_tokens=True)
        assert "(" in d or "（" in d, (idx, d)
    # the '(' byte-token itself is caught
    paren_ids = tok.encode("(Laughter)", add_special_tokens=False)
    assert any(i in bad for i in paren_ids)
    # specials decode to "" under skip_special_tokens -> never banned
    for sid in (toks.eot, toks.sp_patch, toks.latency[0]):
        assert sid not in bad
    # ordinary text is untouched
    for i in tok.encode("the quick brown fox", add_special_tokens=False):
        assert i not in bad


def test_fixture_is_reproducible(tmp_path):
    """Re-running the builder reproduces the committed tokenizer.json and
    template byte-for-byte — the fixture can't silently drift from its
    generator."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_tokenizer_fixture",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "build_tokenizer_fixture.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "rebuilt"
    mod.build(str(out))
    for fname in ("tokenizer.json", "chat_template.jinja"):
        with open(os.path.join(FIXTURE, fname), "rb") as f:
            committed = f.read()
        with open(out / fname, "rb") as f:
            rebuilt = f.read()
        assert committed == rebuilt, fname


@pytest.mark.slow
def test_agent_streams_end_to_end_with_real_tokenizer(ftok):
    """Full InfiniSST agent loop driven by the REAL tokenizer files: HF
    chat-template prompts (date preamble + strip), register_special_tokens
    ids, streaming prefill/beam/evict, and text emission decoded by the
    real byte-level BPE — the last integration seam the per-component
    fixture tests leave open (ref agents/infinisst.py:225-268)."""
    import jax.numpy as jnp

    from infinisst_tpu.agents.infinisst import (
        InfiniSSTAgent,
        InfiniSSTOptions,
    )
    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import dryrun_config
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W

    import dataclasses

    tok, toks = ftok
    base_cfg = dryrun_config()
    V = ((toks.latency[-1] + 1 + 7) // 8) * 8  # cover base vocab + extras
    cfg = dataclasses.replace(
        base_cfg,
        llama=dataclasses.replace(base_cfg.llama, vocab_size=V),
        tokens=toks,
    )

    import jax

    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama),
    }
    builder = PromptBuilder(
        HFTokenizerAdapter(tok), toks, use_hf_template=True, llama31=True
    )
    assert builder.use_hf_template
    stream = StreamConfig(
        max_cache_frames=96, max_llm_cache_tokens=220,
        llm_cache_capacity=512,
    )
    agent = InfiniSSTAgent(
        params, cfg, stream, builder,
        InfiniSSTOptions(latency_multiplier=1, beam=2,
                         max_llm_cache_size=220,
                         no_repeat_ngram_lookback=32),
        param_dtype=jnp.float32,
    )
    rng = np.random.RandomState(11)
    texts = []
    for i in range(3):
        agent.push(
            rng.randn(agent.chunk_samples).astype(np.float32) * 0.1,
            finished=(i == 2),
        )
        texts.append("".join(agent.states.target))
    ids = list(agent.states.target_ids)
    assert len(ids) > 0
    # emissions decode through the REAL tokenizer and contain no special
    # or out-of-base-vocab markers (suppression + skip_special_tokens)
    assert all(i < toks.sp_patch for i in ids)
    full = tok.decode(ids, skip_special_tokens=True)
    assert isinstance(full, str) and len(full) > 0
    # the system prompt (with the real template's date preamble) is
    # pinned in the cache exactly once
    sys_len = len(builder.system_ids(builder.system_text(1)))
    assert agent.system_prompt_size == sys_len
