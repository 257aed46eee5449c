"""Golden-vector validation of the latency metrics (VERDICT r4 #3).

BASELINE's done-bar (StreamLAAL delta <= 50 ms vs the reference) is
measured by eval/latency.py; a metric-implementation discrepancy would
silently invalidate every quality comparison.  The vectors in
tests/fixtures/latency_golden.json are hand-derived from SimulEval's
published scorer semantics (each case documents its arithmetic) — these
tests fail if average_lagging / stream_laal drift from those semantics.

Also: randomized agreement between the C++ mwer segmentation DP
(native/mwer.cpp) and the pure-python fallback (_mwer_segment_bounds) —
both must reach the same minimal summed edit distance on the same split
problem (tie splits may differ; the COST must not).
"""

import json
import os

import numpy as np
import pytest

from infinisst_tpu.eval.latency import (
    Emission,
    InstanceLog,
    _mwer_segment_bounds,
    average_lagging,
    stream_laal,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "latency_golden.json")
with open(FIX) as f:
    GOLD = json.load(f)


@pytest.mark.parametrize(
    "case", GOLD["average_lagging"], ids=lambda c: c["name"]
)
def test_average_lagging_golden(case):
    got = average_lagging(
        case["delays"],
        case["source_ms"],
        case["n_ref_units"],
        length_adaptive=case["length_adaptive"],
    )
    assert abs(got - case["expected"]) < 1e-9, (got, case["derivation"])


@pytest.mark.parametrize("case", GOLD["stream_laal"], ids=lambda c: c["name"])
def test_stream_laal_golden(case):
    log = InstanceLog(source_duration_ms=float(case["source_duration_ms"]))
    log.emissions = [
        Emission(e["text"], float(e["delay_ms"]), float(e["ca_delay_ms"]))
        for e in case["emissions"]
    ]
    got = stream_laal(
        log,
        case["refs"],
        unit=case["unit"],
        computation_aware=case["computation_aware"],
        seg_times=[tuple(t) for t in case["seg_times"]],
    )
    assert abs(got - case["expected"]) < 1e-6, (got, case["derivation"])


# ---------------------------------------------------------------------------
# C++ DP vs pure-python fallback


def _edit(h, r):
    prev = list(range(len(h) + 1))
    for j, rw in enumerate(r, 1):
        cur = [j] + [0] * len(h)
        for i, hw in enumerate(h, 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (0 if hw == rw else 1))
        prev = cur
    return prev[len(h)]


def _split_cost(hyp, refs, bounds):
    cost, start = 0, 0
    for r, end in zip(refs, bounds):
        cost += _edit(hyp[start:end], r)
        start = end
    return cost


def test_native_mwer_matches_python_on_random_inputs():
    from infinisst_tpu.native import load_mwer, mwer_segment_native

    if load_mwer() is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.RandomState(0)
    for trial in range(25):
        vocab = rng.randint(3, 9)
        n_ref = rng.randint(1, 5)
        refs = [
            [int(x) for x in rng.randint(0, vocab, rng.randint(1, 7))]
            for _ in range(n_ref)
        ]
        # hypothesis: noisy concatenation of the refs (sub/del/ins)
        hyp = []
        for r in refs:
            for t in r:
                p = rng.rand()
                if p < 0.15:
                    continue  # deletion
                hyp.append(int(rng.randint(0, vocab)) if p < 0.3 else t)
                if rng.rand() < 0.1:
                    hyp.append(int(rng.randint(0, vocab)))  # insertion
        py = _mwer_segment_bounds(
            [str(t) for t in hyp], [" ".join(map(str, r)) for r in refs],
            "word",
        )
        nat = mwer_segment_native(hyp, refs, band=0)
        assert nat is not None
        assert len(nat) == len(py) == n_ref
        assert nat[-1] == py[-1] == len(hyp)
        assert all(a <= b for a, b in zip(nat, nat[1:]))
        refs_s = [[str(t) for t in r] for r in refs]
        hyp_s = [str(t) for t in hyp]
        assert _split_cost(hyp_s, refs_s, nat) == _split_cost(
            hyp_s, refs_s, py
        ), (trial, hyp, refs, nat, py)
