"""Data layer tests: audio IO, sampler packing, collators, templates,
latency metrics, preprocess helpers."""

import dataclasses
import os

import numpy as np
import pytest

from infinisst_tpu.core.config import SpecialTokens, tiny_model_config
from infinisst_tpu.data import audio as audio_mod
from infinisst_tpu.data.collators import (
    COLLATORS,
    OfflineCollator,
    TrajectoryMultiLatencyCollator,
    perturb_trajectory,
)
from infinisst_tpu.data.dataset import SpeechToTextItem
from infinisst_tpu.data.sampler import SpeechSampler
from infinisst_tpu.data.template import (
    IGNORE_INDEX,
    PromptBuilder,
    StubTokenizer,
    build_trajectory_prompt,
)
from infinisst_tpu.eval.latency import (
    Emission,
    InstanceLog,
    average_lagging,
    stream_laal,
)
from infinisst_tpu.tools.preprocess.utils import word_error_rate

CFG = tiny_model_config()
TOKENS = SpecialTokens(
    bos=500, eot=501, eos=501, start_header=502, end_header=503, pad=504,
    user=505, assistant=506, newline2=507, sp_patch=508, sp_start=509,
    sp_end=510, latency=(511, 511, 511, 511), end_of_text=499,
)
MCFG = CFG.replace(tokens=TOKENS)
BUILDER = PromptBuilder(StubTokenizer(512, lo=10, hi=400), TOKENS)


def test_wav_roundtrip(tmp_path):
    data = np.sin(np.linspace(0, 100, 16000)).astype(np.float32) * 0.5
    p = str(tmp_path / "a.wav")
    audio_mod.write_wav(p, data)
    back, sr = audio_mod.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(back, data, atol=1e-3)
    # sliced read
    part, _ = audio_mod.get_waveform(f"{p}:100:200")
    np.testing.assert_allclose(part, back[100:300], atol=1e-6)


def test_wer():
    assert word_error_rate("a b c", "a b c") == 0.0
    assert word_error_rate("a x c", "a b c") == pytest.approx(1 / 3)
    assert word_error_rate("", "a b") == 1.0


class FakeDS:
    def __init__(self, n):
        self.n_frames = [16000 * (i % 5 + 1) for i in range(n)]
        self.tgt_texts = ["word " * (i % 7 + 1) for i in range(n)]

    def __len__(self):
        return len(self.n_frames)


def test_sampler_packing():
    ds = FakeDS(50)
    s = SpeechSampler(
        ds, shuffle=False, batch_size=400, batch_size_sent=4, min_ms=0,
        tokenizer=lambda t: t.split(),
    )
    seen = set()
    for batch in s:
        assert 1 <= len(batch) <= 4
        seen.update(batch)
    assert seen == set(range(50))
    # rank-strided split covers disjoint batches
    s0 = SpeechSampler(
        ds, shuffle=False, batch_size=400, batch_size_sent=4,
        tokenizer=lambda t: t.split(), rank=0, num_replicas=2,
    )
    s1 = SpeechSampler(
        ds, shuffle=False, batch_size=400, batch_size_sent=4,
        tokenizer=lambda t: t.split(), rank=1, num_replicas=2,
    )
    b0, b1 = list(s0), list(s1)
    assert len(b0) + len(b1) == len(s0.batch_indices)


def _items(n=2, n_units=2):
    items = []
    for i in range(n):
        src = np.random.RandomState(i).randn(
            n_units * 15360 - (320 if i else 0)
        ).astype(np.float32)
        items.append(
            SpeechToTextItem(
                id=f"utt{i}",
                index=i,
                source=src,
                target="hello world out there",
                src_text="hallo welt da draussen",
                trajectory=["hello world", "out there"],
            )
        )
    return items


def test_trajectory_prompt_labels():
    ids, labels = build_trajectory_prompt(
        BUILDER, [["hello world", True], ["out there", False]], 24, 1
    )
    assert (ids == TOKENS.sp_patch).sum() == 24
    # labels: only the first (keep=True) assistant span + its eot supervised
    sup = labels != IGNORE_INDEX
    assert sup.sum() == len(BUILDER.tokenizer.encode("hello world")) + 1
    # supervised positions carry the same ids
    np.testing.assert_array_equal(labels[sup], ids[sup])


@pytest.mark.parametrize("variant", [0, 1, 2, 3, 4])
def test_collators(variant):
    coll = COLLATORS[variant](BUILDER, MCFG, block_size=48)
    batch = coll(_items())
    B, S = batch["input_ids"].shape
    assert batch["speech"].shape[0] == B
    assert batch["labels"].shape == (B, S)
    assert batch["patch_mask"].sum() > 0
    assert (batch["labels"][~batch["attention_mask"].astype(bool)] ==
            IGNORE_INDEX).all()
    # patches match sp_patch positions
    np.testing.assert_array_equal(
        batch["patch_mask"], batch["input_ids"] == TOKENS.sp_patch
    )
    if variant == 0:
        assert "text_input_ids" in batch
    if variant == 4:
        assert 1 <= batch["multiplier"] <= 4


def test_multilatency_patch_counts():
    coll = TrajectoryMultiLatencyCollator(
        BUILDER, MCFG, block_size=48, max_multiplier=2, seed=1
    )
    batch = coll(_items(n=1, n_units=2))
    m = batch["multiplier"]
    n_patches = int(batch["patch_mask"][0].sum())
    # speech token count must equal patch count for unpadded row
    fl = int(batch["frame_lengths"][0])
    assert n_patches == fl // 4


def test_perturb_preserves_text():
    rng = np.random.RandomState(0)
    traj = [["a b", True], ["c", True], ["d e f", True]]
    out = perturb_trajectory(
        [list(x) for x in traj], rng, cut=lambda s: s.split()
    )
    # total characters preserved (modulo spaces within segments)
    orig = "".join(seg for seg, _ in traj)
    new = "".join(seg for seg, _ in out)
    assert sorted(orig.replace(" ", "")) == sorted(new.replace(" ", ""))


def test_average_lagging():
    # instant emission -> lagging equals delays offset
    al = average_lagging([100, 200, 300], 300, 3)
    assert al == pytest.approx(((100 - 0) + (200 - 100) + (300 - 200)) / 3)


def test_stream_laal_runs():
    log = InstanceLog(source_duration_ms=2000)
    log.emissions = [
        Emission("hello world", 900, 1000),
        Emission("again", 1900, 2100),
    ]
    v = stream_laal(log, ["hello world", "again"], "word")
    v_ca = stream_laal(log, ["hello world", "again"], "word", True)
    assert np.isfinite(v) and np.isfinite(v_ca) and v_ca >= v


def test_mwer_segment_bounds():
    from infinisst_tpu.eval.latency import _mwer_segment_bounds

    hyp = "hello world this is great and more words".split()
    refs = ["hello world", "this is great", "and more words"]
    bounds = _mwer_segment_bounds(hyp, refs, "word")
    assert bounds == [2, 5, 8]
    # noisy hypothesis still splits sensibly (monotone, covers all)
    hyp2 = "helo world this great and extra more words".split()
    b2 = _mwer_segment_bounds(hyp2, refs, "word")
    assert b2[-1] == len(hyp2) and b2 == sorted(b2)


def test_native_mwer_matches_python():
    from infinisst_tpu.native import mwer_segment_native
    from infinisst_tpu.eval.latency import _mwer_segment_bounds

    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(30)]
    refs, hyp = [], []
    for _ in range(5):
        seg = [vocab[i] for i in rng.randint(0, 30, rng.randint(2, 7))]
        refs.append(" ".join(seg))
        noisy = [w if rng.rand() > 0.2 else vocab[rng.randint(30)]
                 for w in seg]
        hyp.extend(noisy)
    py_bounds = _mwer_segment_bounds(hyp, refs, "word")

    interned = {}
    def iid(w):
        return interned.setdefault(w, len(interned))
    hyp_ids = [iid(w) for w in hyp]
    ref_ids = [[iid(w) for w in r.split()] for r in refs]
    nat = mwer_segment_native(hyp_ids, ref_ids, band=0)
    if nat is None:
        pytest.skip("no g++ available")
    assert nat == py_bounds
    # banded mode stays monotone and covers the stream
    nat_b = mwer_segment_native(hyp_ids, ref_ids, band=3)
    assert nat_b[-1] == len(hyp) and nat_b == sorted(nat_b)


def test_collator_validate_sweep():
    from infinisst_tpu.data.collators import TrajectoryCollator

    class DS:
        def __init__(self):
            self.ids = ["a", "b"]
            self.n_frames = [15360, 2 * 15360]
            self.trajectories = [["one"], ["one", "two"]]

        def __len__(self):
            return 2

    coll = TrajectoryCollator(BUILDER, MCFG, block_size=48)
    assert coll.validate(DS()) == 2

    class BadDS(DS):
        def __init__(self):
            super().__init__()
            self.trajectories = [["one", "extra"], ["one", "two"]]

    with pytest.raises(AssertionError):
        coll.validate(BadDS())


class FakeBPE:
    """Leading-space-sensitive tokenizer (GPT/Llama-style): ' German' and
    'German' are different pieces, so per-word encoding of a sentence
    differs from whole-string encoding."""

    vocab_size = 100000

    def __init__(self):
        self.vocab = {}

    def _id(self, piece):
        return self.vocab.setdefault(piece, 2000 + len(self.vocab))

    def encode(self, text):
        import re

        return [self._id(p) for p in re.findall(r"\s*\S+|\s+", text)]

    def decode(self, ids, skip_special_tokens=True):
        inv = {v: k for k, v in self.vocab.items()}
        return "".join(inv.get(i, "?") for i in ids)


def test_sys_text_ids_whole_string_bpe():
    """The non-HF-template fallback must encode the system text as a whole
    string (latency token spliced), id-equal to manual whole-piece
    encoding — NOT word-by-word (which loses leading-space merges)."""
    tok = FakeBPE()
    b = PromptBuilder(tok, TOKENS, use_hf_template=False)
    text = b.system_text(2)
    got = b._sys_text_ids(text)

    pre, post = text.split("<latency_2>")
    want = tok.encode(pre) + [TOKENS.latency[1]] + tok.encode(post)
    assert got == want
    # word-by-word encoding would differ (no leading-space pieces)
    wordwise = [i for w in text.split(" ") for i in tok.encode(w)]
    assert got != wordwise


def test_sys_text_ids_registered_latency_token():
    """When the tokenizer itself knows the latency token (HF path after
    register_special_tokens), its ids are used verbatim."""

    class TokWithLatency(FakeBPE):
        def encode(self, text):
            import re

            out = []
            for part in re.split(r"(<latency_\d+>)", text):
                m = re.fullmatch(r"<latency_(\d+)>", part)
                if m:
                    out.append(TOKENS.latency[int(m.group(1)) - 1])
                elif part:
                    out.extend(super().encode(part))
            return out

    tok = TokWithLatency()
    b = PromptBuilder(tok, TOKENS, use_hf_template=False)
    got = b._sys_text_ids(b.system_text(3))
    assert TOKENS.latency[2] in got
    assert got == tok.encode(b.system_text(3))


def test_sys_text_ids_out_of_range_latency_is_plain_text():
    """<latency_0> / <latency_99> are NOT latency ids (Python's -1 index
    would silently alias <latency_0> to the LAST latency id): they must be
    encoded as ordinary text, and in-range tokens in the same string must
    still splice correctly."""
    toks = dataclasses.replace(TOKENS, latency=(511, 512, 513, 514))
    tok = FakeBPE()
    b = PromptBuilder(tok, toks, use_hf_template=False)

    for bad in ("<latency_0>", "<latency_99>"):
        text = f"speak with latency {bad}."
        got = b._sys_text_ids(text)
        assert got == tok.encode(text)          # plain whole-string encode
        assert not set(got) & set(toks.latency)

    mixed = "first <latency_0> then <latency_2> end"
    got = b._sys_text_ids(mixed)
    assert toks.latency[1] in got               # in-range still spliced
    assert toks.latency[-1] not in got          # latency_0 did NOT alias
