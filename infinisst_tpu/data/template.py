"""Llama-3/3.1 chat template construction for the streaming transcript.

The reference builds prompts with tokenizer.apply_chat_template at every
chunk and then searches for header tokens to find the speech span
(agents/infinisst.py:225-268, model/llm.py:88-113).  Here the template is
constructed once per (multiplier, first/later) as a fixed token layout, so
the jitted prefill sees a closed set of shapes and the patch offset is a
compile-time constant.

Layout (llama-3.1 semantics):
  first chunk:
    <|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n
    {system text, incl. <latency_m>}<|eot_id|>
    <|start_header_id|>user<|end_header_id|>\n\n {12m x <sp_patch>} <|eot_id|>
    <|start_header_id|>assistant<|end_header_id|>\n\n
  later chunks: the user+assistant part only — the reference renders the
    full template and strips the auto-inserted system block
    (agents/infinisst.py:262-266); building only the tail is equivalent.

Tokenization of the system text needs a real tokenizer; tests use
StubTokenizer.  When a HF tokenizer is supplied, its apply_chat_template is
used for the system segment so the rendered ids (including any
template-injected preamble like the 3.1 date block) match the training data.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from infinisst_tpu.core.config import SpecialTokens

DEFAULT_SPEECH_PATCH_TOKEN = "<sp_patch>"
DEFAULT_SPEECH_START_TOKEN = "<sp_start>"
DEFAULT_SPEECH_END_TOKEN = "<sp_end>"
DEFAULT_LATENCY_TOKEN = "<latency_{}>"
IGNORE_INDEX = -100


class StubTokenizer:
    """Deterministic hash tokenizer for tests: one id per word."""

    def __init__(self, vocab_size: int = 128263, lo: int = 1000, hi: int = 60000):
        self.vocab_size = vocab_size
        self.lo, self.hi = lo, hi

    def encode(self, text: str) -> List[int]:
        words = text.split()
        if not words and text:
            # pure-whitespace strings (e.g. the chat template's "\n\n")
            # still occupy one token, as in the real Llama tokenizer
            words = [repr(text)]
        out = []
        for w in words:
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            out.append(self.lo + h % (self.hi - self.lo))
        return out

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{i}" for i in ids)


class HFTokenizerAdapter:
    """Wraps a HF tokenizer (with the 7 extra tokens registered, ref:
    model/llm.py:149-190) behind the minimal interface the agents use."""

    def __init__(self, tok):
        self.tok = tok
        self.vocab_size = len(tok)

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tok.decode(ids, skip_special_tokens=skip_special_tokens)

    def apply_chat_template(self, messages) -> List[int]:
        return list(
            self.tok.apply_chat_template(
                messages, add_special_tokens=False
            )
        )


def register_special_tokens(tok, model_cfg, max_multiplier: int = 4):
    """Register the 7 extra tokens on a HF tokenizer and verify their ids
    line up with the model config (the reference's preprocess(),
    model/llm.py:149-190; ids follow the base vocab: sp_patch == 128256,
    agents/alignatt.py:142)."""
    tok.add_tokens(
        [
            DEFAULT_SPEECH_PATCH_TOKEN,
            DEFAULT_SPEECH_START_TOKEN,
            DEFAULT_SPEECH_END_TOKEN,
        ]
        + [DEFAULT_LATENCY_TOKEN.format(i) for i in range(1, max_multiplier + 1)],
        special_tokens=True,
    )
    tok.pad_token = "<|finetune_right_pad_id|>"
    t = model_cfg.tokens
    got = tok.convert_tokens_to_ids(
        [
            DEFAULT_SPEECH_PATCH_TOKEN,
            DEFAULT_SPEECH_START_TOKEN,
            DEFAULT_SPEECH_END_TOKEN,
        ]
    )
    expect = [t.sp_patch, t.sp_start, t.sp_end]
    assert got == expect, (
        f"added-token ids {got} do not match the model config {expect}; "
        "check the tokenizer matches the released checkpoints"
    )
    assert len(tok) <= model_cfg.llama.vocab_size, (
        len(tok), model_cfg.llama.vocab_size,
    )
    return tok


@dataclass
class ChunkPrompt:
    ids: np.ndarray  # (S,) int32
    patch_start: int  # index of the first <sp_patch>
    n_patches: int


class PromptBuilder:
    def __init__(
        self,
        tokenizer,
        tokens: SpecialTokens,
        source_lang: str = "English",
        target_lang: str = "German",
        llama31: bool = True,
        use_hf_template: Optional[bool] = None,
    ):
        self.tokenizer = tokenizer
        self.t = tokens
        self.source_lang = source_lang
        self.target_lang = target_lang
        self.llama31 = llama31
        # exact-parity mode: render through the HF tokenizer's chat template
        # (matches the reference's apply_chat_template output, including any
        # template-injected preamble) when a real tokenizer is available
        if use_hf_template is None:
            use_hf_template = hasattr(tokenizer, "apply_chat_template")
        self.use_hf_template = use_hf_template

    # -- pieces ------------------------------------------------------------
    def system_text(self, multiplier: int) -> str:
        # ref: agents/infinisst.py:228-233
        lat = DEFAULT_LATENCY_TOKEN.format(multiplier)
        return (
            f"Translate the following speech from {self.source_lang} to "
            f"{self.target_lang} with latency {lat}."
        )

    def offline_system_text(self) -> str:
        # ref: agents/alignatt.py:58-61 (no latency token)
        return (
            f"Translate the following speech from {self.source_lang} to "
            f"{self.target_lang}."
        )

    def _sys_text_ids(self, text: str) -> List[int]:
        """Tokenize system text, mapping the latency token to its id.

        The text is encoded as a WHOLE string: per-word encoding breaks
        BPE leading-space merges on real tokenizers (' German' !=
        'German').  If the tokenizer already knows the latency token
        (register_special_tokens), its output is used directly; otherwise
        the text is split around the literal token and each side encoded
        whole, with the latency id spliced in."""
        import re

        t = self.t
        ids = list(self.tokenizer.encode(text))
        # "tokenizer knows the latency token" must be decided per literal
        # token, not by scanning ids for latency values — an ordinary text
        # token could collide with a configured latency id on non-Llama id
        # layouts and silently skip the splice below
        m_all = re.findall(r"<latency_(\d+)>", text)
        # only 1..len(t.latency) are real latency ids; <latency_0> or an
        # out-of-range N is ordinary text (Python's -1 index would silently
        # alias <latency_0> to the LAST latency id otherwise)
        valid = [g for g in m_all if 1 <= int(g) <= len(t.latency)]
        knows_latency = valid and all(
            list(self.tokenizer.encode(f"<latency_{g}>"))
            == [t.latency[int(g) - 1]]
            for g in valid
        )
        if knows_latency or not valid:
            return ids
        out: List[int] = []
        for part in re.split(r"(<latency_\d+>)", text):
            m = re.fullmatch(r"<latency_(\d+)>", part)
            if m and 1 <= int(m.group(1)) <= len(t.latency):
                out.append(t.latency[int(m.group(1)) - 1])
            elif part:
                out.extend(self.tokenizer.encode(part))
        return out

    def system_ids(self, text: str) -> np.ndarray:
        """<|begin_of_text|> + system block."""
        if self.use_hf_template:
            ids = self.tokenizer.apply_chat_template(
                [{"role": "system", "content": text}]
            )
            return np.asarray(ids, np.int32)
        t = self.t
        ids = (
            [t.bos, t.start_header]
            + self.tokenizer.encode("system")
            + [t.end_header]
            + self.tokenizer.encode("\n\n")
            + self._sys_text_ids(text)
            + [t.eot]
        )
        return np.asarray(ids, np.int32)

    def _turn_ids(self, n_patches: int) -> List[int]:
        """user turn with n speech patches + open assistant header."""
        t = self.t
        nl2 = self.tokenizer.encode("\n\n")
        return (
            [t.start_header, t.user, t.end_header]
            + nl2
            + [t.sp_patch] * n_patches
            + [t.eot, t.start_header, t.assistant, t.end_header]
            + nl2
        )

    # -- chunk prompts -----------------------------------------------------
    def chunk_prompt(
        self, multiplier: int, first: bool, n_patches: Optional[int] = None
    ) -> ChunkPrompt:
        """Prompt ids for one streaming chunk (ref: agents/infinisst.py:
        225-268).  n_patches defaults to 12*m."""
        if n_patches is None:
            n_patches = 12 * multiplier
        t = self.t
        if self.use_hf_template:
            # render [system?, user(patches), assistant("")] exactly as the
            # reference does (agents/infinisst.py:225-268): full template,
            # trailing assistant <|eot_id|> stripped; for later chunks the
            # auto-inserted system block is removed (the 3.1 strip)
            messages = []
            sys_text = self.system_text(multiplier)
            messages.append({"role": "system", "content": sys_text})
            messages.append(
                {"role": "user", "content": DEFAULT_SPEECH_PATCH_TOKEN * n_patches}
            )
            messages.append({"role": "assistant", "content": ""})
            ids = self.tokenizer.apply_chat_template(messages)[:-1]
            if not first:
                sys_len = len(self.system_ids(sys_text))
                if self.llama31:
                    ids = ids[sys_len:]
                else:
                    ids = [t.eos] + ids[sys_len:]
            ids = np.asarray(ids, np.int32)
            patch_pos = np.where(ids == t.sp_patch)[0]
            assert len(patch_pos) == n_patches, (len(patch_pos), n_patches)
            return ChunkPrompt(
                ids=ids, patch_start=int(patch_pos[0]), n_patches=n_patches
            )
        nl2 = self.tokenizer.encode("\n\n")
        header = [t.start_header, t.user, t.end_header] + nl2
        if first:
            sys_ids = list(self.system_ids(self.system_text(multiplier)))
            ids = sys_ids + self._turn_ids(n_patches)
            patch_start = len(sys_ids) + len(header)
        else:
            ids = self._turn_ids(n_patches)
            patch_start = len(header)
            if not self.llama31:
                # llama-3-8B-instruct: keep a leading eos in place of bos
                # (ref: agents/infinisst.py:266)
                ids = [t.eos] + ids
                patch_start += 1
        return ChunkPrompt(
            ids=np.asarray(ids, np.int32),
            patch_start=patch_start,
            n_patches=n_patches,
        )

    def offline_prompt(
        self, n_patches: int, target_ids: Sequence[int]
    ) -> ChunkPrompt:
        """Single-turn offline prompt with target-so-far as assistant prefix
        (ref: agents/alignatt.py:54-83)."""
        sys_ids = list(self.system_ids(self.offline_system_text()))
        ids = sys_ids + self._turn_ids(n_patches) + list(target_ids)
        patch_start = len(sys_ids) + 3 + len(self.tokenizer.encode("\n\n"))
        return ChunkPrompt(
            ids=np.asarray(ids, np.int32),
            patch_start=patch_start,
            n_patches=n_patches,
        )

    def system_prompt_size(self, multiplier: int) -> int:
        return len(self.system_ids(self.system_text(multiplier)))


def build_trajectory_prompt(
    builder: PromptBuilder,
    trajectory: List[str],
    n_speech_tokens: int,
    multiplier: int,
    latency_token: bool = True,
):
    """Training-side multi-turn transcript for one sample: system + one
    (user patches, assistant text) turn pair per trajectory segment.
    Returns (ids, labels) with labels = IGNORE_INDEX outside assistant spans
    (ref: train/dataset.py:786-940, collator 4).

    ``trajectory`` entries may be (text, keep) pairs; segments with
    keep=False get their labels masked (perturbation modes, ref
    :767-770)."""
    t = builder.t
    seg = 12 * multiplier
    ids: List[int] = list(
        builder.system_ids(
            builder.system_text(multiplier)
            if latency_token
            else builder.offline_system_text()
        )
    )
    labels: List[int] = [IGNORE_INDEX] * len(ids)
    nl2 = builder.tokenizer.encode("\n\n")
    for j, entry in enumerate(trajectory):
        if isinstance(entry, (list, tuple)):
            text, keep = entry[0], entry[1]
        else:
            text, keep = entry, True
        n_sp = min(seg, n_speech_tokens - j * seg)
        assert n_sp > 0, "trajectory longer than speech"
        turn = (
            [t.start_header, t.user, t.end_header]
            + nl2
            + [t.sp_patch] * n_sp
            + [t.eot, t.start_header, t.assistant, t.end_header]
            + nl2
        )
        ids.extend(turn)
        labels.extend([IGNORE_INDEX] * len(turn))
        text_ids = builder.tokenizer.encode(text) if text else []
        ids.extend(text_ids + [t.eot])
        if keep:
            labels.extend(text_ids + [t.eot])
        else:
            labels.extend([IGNORE_INDEX] * (len(text_ids) + 1))
    return np.asarray(ids, np.int32), np.asarray(labels, np.int32)
