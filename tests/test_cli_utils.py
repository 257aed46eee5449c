"""Host-side CLI helper tests (no model build)."""

import numpy as np

from infinisst_tpu.agents.cli import build_suppress_list


class FakeHFTok:
    """Mimics a HF Llama-3 tokenizer: vocab_size EXCLUDES added specials,
    len() includes them; decode(skip_special_tokens=True) hides specials."""

    vocab_size = 4

    _decodes = {
        0: "hello",
        1: "(aside",     # base-vocab id containing '('
        2: "world",
        3: "（嗯",        # fullwidth paren
        4: "<|special|>",  # added special: hidden when skip_special_tokens
        5: "(music)",      # ADDED token with a paren — ref scan catches it
    }

    def __len__(self):
        return 6

    def decode(self, ids, skip_special_tokens=True):
        out = []
        for i in ids:
            d = self._decodes[i]
            if skip_special_tokens and d.startswith("<|"):
                continue
            out.append(d)
        return "".join(out)


def test_suppress_list_scans_added_tokens_and_skips_specials():
    """The ban list must scan len(tokenizer) (added tokens included — on
    Llama-3 HF tokenizers vocab_size excludes the 256 added specials) and
    decode with skip_special_tokens=True, per the reference's load-time
    scan (ref: agents/infinisst.py:142-148)."""
    got = build_suppress_list(FakeHFTok())
    np.testing.assert_array_equal(got, [1, 3, 5])


def test_suppress_list_vocab_size_fallback():
    class NoLen:
        vocab_size = 4
        def decode(self, ids, skip_special_tokens=True):
            return "(x" if ids[0] == 2 else "ok"

    got = build_suppress_list(NoLen())
    np.testing.assert_array_equal(got, [2])
