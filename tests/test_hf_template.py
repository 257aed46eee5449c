"""Pin the HF chat-template render path against a REAL byte-level BPE
tokenizer (not StubTokenizer): a PreTrainedTokenizerFast trained in-test
with a Llama-3.1-style chat template and the 7 extra tokens.

What this verifies (ref: agents/infinisst.py:225-268 — the reference's
prompt is apply_chat_template output with the later-chunk system strip):

1. With a plain (no-preamble) template, ``use_hf_template=True`` rendering
   is id-for-id EQUAL to the manual fixed-layout path — header tokens,
   "\n\n" pieces, BPE leading-space merges, and the latency-token splice
   all line up.
2. With the 3.1-style template that auto-injects a date preamble into the
   system block, the strip arithmetic stays correct: system_ids is an
   exact prefix of the first-chunk render, the later-chunk render is the
   first-chunk render minus that prefix, and patch positions/counts hold.
"""

import numpy as np
import pytest

pytest.importorskip("tokenizers")
from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
from transformers import PreTrainedTokenizerFast

from infinisst_tpu.core.config import SpecialTokens
from infinisst_tpu.data.template import (
    DEFAULT_SPEECH_END_TOKEN,
    DEFAULT_SPEECH_PATCH_TOKEN,
    DEFAULT_SPEECH_START_TOKEN,
    HFTokenizerAdapter,
    PromptBuilder,
)

# Llama-3-style: system block is the content verbatim.
PLAIN_TEMPLATE = (
    "{{- bos_token }}{%- for message in messages %}"
    "{{- '<|start_header_id|>' + message['role'] + '<|end_header_id|>"
    "\n\n' + message['content'] + '<|eot_id|>' }}"
    "{%- endfor %}"
)

# Llama-3.1-style: the template auto-injects a date preamble INSIDE the
# system block (the real 3.1 template's Cutting Knowledge/Today Date text).
PREAMBLE_TEMPLATE = (
    "{{- bos_token }}{%- for message in messages %}"
    "{%- if loop.first and message['role'] == 'system' %}"
    "{{- '<|start_header_id|>system<|end_header_id|>\n\n"
    "Cutting Knowledge Date: December 2023\nToday Date: 26 Jul 2024\n\n'"
    " + message['content'] + '<|eot_id|>' }}"
    "{%- else %}"
    "{{- '<|start_header_id|>' + message['role'] + '<|end_header_id|>"
    "\n\n' + message['content'] + '<|eot_id|>' }}"
    "{%- endif %}{%- endfor %}"
)

CORPUS = [
    "Translate the following speech from English to German with latency .",
    "Translate the following speech from English to Chinese .",
    "Cutting Knowledge Date: December 2023",
    "Today Date: 26 Jul 2024",
    "system user assistant",
    "the quick brown fox jumps over the lazy dog",
]

SPECIALS = [
    "<|begin_of_text|>", "<|end_of_text|>", "<|start_header_id|>",
    "<|end_header_id|>", "<|eot_id|>", "<|finetune_right_pad_id|>",
    DEFAULT_SPEECH_PATCH_TOKEN, DEFAULT_SPEECH_START_TOKEN,
    DEFAULT_SPEECH_END_TOKEN,
] + [f"<latency_{i}>" for i in range(1, 5)]


@pytest.fixture(scope="module")
def bpe_tok():
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600,
        special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS, trainer)
    ftok = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|begin_of_text|>",
        eos_token="<|eot_id|>",
        pad_token="<|finetune_right_pad_id|>",
        additional_special_tokens=SPECIALS[2:],
    )
    # role names as atomic (non-special) tokens so the manual layout's
    # single-id role slots are representable
    ftok.add_tokens(["system", "user", "assistant"])
    return ftok


def _tokens_for(ftok) -> SpecialTokens:
    def tid(s):
        i = ftok.convert_tokens_to_ids(s)
        assert i is not None and i != ftok.unk_token_id
        return i

    return SpecialTokens(
        bos=tid("<|begin_of_text|>"),
        end_of_text=tid("<|end_of_text|>"),
        eot=tid("<|eot_id|>"),
        eos=tid("<|eot_id|>"),
        start_header=tid("<|start_header_id|>"),
        end_header=tid("<|end_header_id|>"),
        pad=tid("<|finetune_right_pad_id|>"),
        user=tid("user"),
        assistant=tid("assistant"),
        newline2=ftok.encode("\n\n", add_special_tokens=False)[0],
        sp_patch=tid(DEFAULT_SPEECH_PATCH_TOKEN),
        sp_start=tid(DEFAULT_SPEECH_START_TOKEN),
        sp_end=tid(DEFAULT_SPEECH_END_TOKEN),
        latency=tuple(tid(f"<latency_{i}>") for i in range(1, 5)),
    )


def test_hf_template_render_equals_manual_layout(bpe_tok):
    """Plain template: the two PromptBuilder modes produce IDENTICAL ids
    for first and later chunks at every multiplier."""
    bpe_tok.chat_template = PLAIN_TEMPLATE
    toks = _tokens_for(bpe_tok)
    adapter = HFTokenizerAdapter(bpe_tok)
    hf = PromptBuilder(adapter, toks, use_hf_template=True)
    manual = PromptBuilder(adapter, toks, use_hf_template=False)

    # role names must be single ids for the manual layout to be exact
    assert adapter.encode("user") == [toks.user]
    assert adapter.encode("assistant") == [toks.assistant]
    # the latency token is a registered special: one id (the splice path)
    assert adapter.encode("<latency_2>") == [toks.latency[1]]

    for m in (1, 2, 4):
        for first in (True, False):
            a = hf.chunk_prompt(m, first=first)
            b = manual.chunk_prompt(m, first=first)
            np.testing.assert_array_equal(a.ids, b.ids), (m, first)
            assert a.patch_start == b.patch_start
            assert a.n_patches == b.n_patches == 12 * m
    assert hf.system_prompt_size(2) == manual.system_prompt_size(2)


def test_hf_template_encoding_is_whole_string(bpe_tok):
    """The render must preserve BPE leading-space merges: encoding the
    system text word-by-word differs from the whole-string encode that the
    template path uses (the ' German' != 'German' hazard)."""
    bpe_tok.chat_template = PLAIN_TEMPLATE
    toks = _tokens_for(bpe_tok)
    adapter = HFTokenizerAdapter(bpe_tok)
    b = PromptBuilder(adapter, toks, use_hf_template=True)
    text = b.system_text(1)
    whole = adapter.encode(text)
    wordwise = [i for w in text.split(" ") for i in adapter.encode(w)]
    assert whole != wordwise  # the corpus trains ' German'-style merges
    sys_ids = [int(i) for i in b.system_ids(text)]
    # bos + header(3: <shid> system <ehid>) + the "\n\n" piece(s), then the
    # whole-string system text, then eot
    assert sys_ids[0] == toks.bos
    assert sys_ids[-1] == toks.eot
    nl = adapter.encode("\n\n")
    inner = sys_ids[4 + len(nl):-1]
    assert inner == whole


def test_hf_template_date_preamble_strip(bpe_tok):
    """3.1-style template with auto-injected date preamble: system_ids is
    an exact prefix of the first-chunk render; the later-chunk render is
    the remainder (the reference's system strip, agents/infinisst.py:
    262-266); patch geometry is intact."""
    bpe_tok.chat_template = PREAMBLE_TEMPLATE
    toks = _tokens_for(bpe_tok)
    adapter = HFTokenizerAdapter(bpe_tok)
    b = PromptBuilder(adapter, toks, use_hf_template=True, llama31=True)

    m = 2
    first = b.chunk_prompt(m, first=True)
    later = b.chunk_prompt(m, first=False)
    sys_ids = list(b.system_ids(b.system_text(m)))

    # the preamble IS in the system block (longer than the content alone)
    assert len(sys_ids) > len(adapter.encode(b.system_text(m))) + 6

    np.testing.assert_array_equal(first.ids[: len(sys_ids)], sys_ids)
    np.testing.assert_array_equal(first.ids[len(sys_ids):], later.ids)

    for p in (first, later):
        patch = np.where(p.ids == toks.sp_patch)[0]
        assert len(patch) == 12 * m
        assert patch[0] == p.patch_start
        # patches are contiguous
        assert patch[-1] - patch[0] == 12 * m - 1
    # later chunk starts at the user header (the strip landed on the seam)
    assert later.ids[0] == toks.start_header
    assert later.ids[1] == toks.user


def test_hf_template_latency_token_single_id(bpe_tok):
    """The latency token renders as exactly one id inside the system
    segment of the template output, for every multiplier."""
    bpe_tok.chat_template = PREAMBLE_TEMPLATE
    toks = _tokens_for(bpe_tok)
    adapter = HFTokenizerAdapter(bpe_tok)
    b = PromptBuilder(adapter, toks, use_hf_template=True)
    for m in (1, 2, 3, 4):
        sys_ids = list(b.system_ids(b.system_text(m)))
        assert sys_ids.count(toks.latency[m - 1]) == 1
        for other in set(range(4)) - {m - 1}:
            assert toks.latency[other] not in sys_ids
