"""Driver benchmark: streaming RTF of the InfiniSST pipeline on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: computation-only streaming RTF (wall time per chunk /
chunk duration) at latency multiplier 1 with beam 4 — the reference
measures the same with its synchronized_timer (agents/infinisst.py:37-48);
baseline RTF on L40S for En-De m=1 is 0.382 (plots/plot.ipynb cell 9,
BASELINE.md).  vs_baseline is the speedup factor baseline_rtf / our_rtf
(>1 = faster than the reference).

Model scale (default): the FLAGSHIP config — wav2vec2-large encoder
(reference scale) + the full Llama-3.1-8B architecture, run single-chip
with int8 projections (bf16 8B does not fit a 16 GB v5e chip; the
reference needs a 48 GB L40S).  This is the honest apples-to-apples
comparison against the reference's 8B RTF numbers.  ``--model bench``
runs a 1.5B-class decoder instead; the bf16 8B path runs under tensor
parallelism (see __graft_entry__.dryrun_multichip).  ``--mode serve``
measures batched multi-client decode throughput.  Weights are random; RTF
does not depend on weight values.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the big fused chunk graph compiles once per
    # machine; later runs (and the driver's bench) reuse it.
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from infinisst_tpu.agents.infinisst import InfiniSSTAgent, InfiniSSTOptions
    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import bench_1chip_config
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W

    multiplier = int(sys.argv[sys.argv.index("--multiplier") + 1]) if "--multiplier" in sys.argv else 1
    n_chunks = int(sys.argv[sys.argv.index("--chunks") + 1]) if "--chunks" in sys.argv else 12
    mode = sys.argv[sys.argv.index("--mode") + 1] if "--mode" in sys.argv else "stream"
    quantize = "--quantize" in sys.argv
    model = sys.argv[sys.argv.index("--model") + 1] if "--model" in sys.argv else "8b"
    warmup = 3

    if mode == "serve":
        pool = int(sys.argv[sys.argv.index("--pool") + 1]) if "--pool" in sys.argv else 8
        beam = int(sys.argv[sys.argv.index("--beam") + 1]) if "--beam" in sys.argv else 4
        mixed = (
            tuple(
                int(x) for x in
                sys.argv[sys.argv.index("--multipliers") + 1].split(",")
            )
            if "--multipliers" in sys.argv else None
        )
        return bench_serve(multiplier, n_chunks, pool=pool, model=model,
                           beam=beam, multipliers=mixed,
                           speculative="--speculative" in sys.argv,
                           spec_guard="--spec-no-guard" not in sys.argv,
                           spec_resid_scale=(
                               float(sys.argv[sys.argv.index(
                                   "--spec-resid-scale") + 1])
                               if "--spec-resid-scale" in sys.argv
                               else None
                           ),
                           spec_accept_all="--spec-accept-all" in sys.argv,
                           spec_head_vocab=(
                               int(sys.argv[sys.argv.index(
                                   "--spec-head-vocab") + 1])
                               if "--spec-head-vocab" in sys.argv else 0
                           ),
                           do_sample="--do-sample" in sys.argv,
                           temperature=(
                               float(sys.argv[sys.argv.index(
                                   "--temperature") + 1])
                               if "--temperature" in sys.argv else 1.0
                           ),
                           top_k=(
                               int(sys.argv[sys.argv.index("--top-k") + 1])
                               if "--top-k" in sys.argv else 0
                           ))
    if mode == "train":
        return bench_train(multiplier, n_steps=n_chunks)
    if mode == "train-io":
        return bench_train_io(n_steps=n_chunks)
    if mode == "streamatt":
        return bench_streamatt(n_chunks=max(n_chunks, 40))
    if mode == "alignatt":
        return bench_alignatt(
            n_chunks=max(n_chunks, 12),
            early_stop="--early-stop" in sys.argv,
        )

    if model == "8b":
        # full Llama-3.1-8B architecture, int8 projections + int8-W8A8
        # lm_head, on ONE 16 GB chip (the reference needs a 48 GB L40S for
        # bf16 8B).  W8A8 activations and the int8 head are the DEFAULT;
        # opt out with --no-act-int8 / --bf16-head.
        from infinisst_tpu.core.presets import flagship_config
        from infinisst_tpu.models.quant import init_quantized_llama

        cfg = flagship_config()
        dtype = jnp.bfloat16
        k = jax.random.PRNGKey(0)
        lm_head_int8 = "--bf16-head" not in sys.argv
        act_int8 = "--no-act-int8" not in sys.argv
        # per-group weight/activation scales (quality-belt modes):
        # --group128 = 32 groups/4096 (fine belt), --group-size 512 =
        # 8 groups (fast belt: the einsum's (M, G, O) int32 HBM
        # intermediate scales with G, so G=8 costs a quarter of G=32)
        group_size = 128 if "--group128" in sys.argv else 0
        if "--group-size" in sys.argv:
            group_size = int(sys.argv[sys.argv.index("--group-size") + 1])
        group128 = bool(group_size)
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": init_quantized_llama(
                jax.random.fold_in(k, 2), cfg.llama,
                act_int8=act_int8, lm_head_int8=lm_head_int8,
                group_size=group_size,
                # the belt keeps the lm_head per-channel (the grouped
                # einsum costs ~25% extra on the 512 MB head stream for
                # no proxy-measurable fidelity gain); --group-head opts
                # the head back in
                head_group_size=(
                    group_size if "--group-head" in sys.argv else 0
                ),
            ),
        }
        quantize = False  # already quantized at init
        tag = "8b_int8" + (f"_g{group_size}" if group_size else "") + (
            "h" if group_size and "--group-head" in sys.argv else ""
        )
    else:
        cfg = bench_1chip_config()
        dtype = jnp.bfloat16
        k = jax.random.PRNGKey(0)
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
        }
        tag = "1chip" + ("_int8" if quantize else "")
    stream = StreamConfig()
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size), cfg.tokens)
    # --speculative: layer-skip draft + k-token verify GREEDY decode
    # (decode/speculative.py; exact greedy semantics).  With random bench
    # weights the draft's acceptance is ~0, so the honest random-weight
    # row shows the overhead case; --spec-accept-all measures the
    # machinery ceiling (every draft accepted, k+1 tokens per weight
    # stream) — real-checkpoint acceptance lands between the two.
    spec_on = "--speculative" in sys.argv
    spec_kw = {}
    if spec_on:
        spec_kw = dict(
            speculative=True,
            spec_draft_layers=(
                int(sys.argv[sys.argv.index("--spec-draft-layers") + 1])
                if "--spec-draft-layers" in sys.argv else 8
            ),
            spec_k=(
                int(sys.argv[sys.argv.index("--spec-k") + 1])
                if "--spec-k" in sys.argv else 4
            ),
            spec_accept_all="--spec-accept-all" in sys.argv,
            spec_head_vocab=(
                int(sys.argv[sys.argv.index("--spec-head-vocab") + 1])
                if "--spec-head-vocab" in sys.argv else 0
            ),
            # --spec-beam: speculative BEAM-4 search (tree verify) —
            # the headline QUALITY config with the speculative speedup
            spec_beam="--spec-beam" in sys.argv,
            # the acceptance guard is ON by default (--speculative cannot
            # lose: a below-break-even draft drops to plain-cost decode);
            # --spec-no-guard measures the raw overhead envelope instead
            spec_guard="--spec-no-guard" not in sys.argv,
        )
        if "--spec-lowrank-rank" in sys.argv:
            # random low-rank draft-head factors (machinery row: with
            # random bench weights acceptance is ~0 either way, so this
            # measures the draft-step cost cut of streaming r*(D+V)
            # factor bytes instead of the D*V head; created on device —
            # a host SVD would need a 0.5 GB fetch over the tunnel)
            r = int(sys.argv[sys.argv.index("--spec-lowrank-rank") + 1])
            D, V = cfg.llama.hidden_size, cfg.llama.vocab_size
            kl = jax.random.PRNGKey(11)
            spec_kw["spec_lowrank_head"] = {
                "a": jax.random.normal(kl, (D, r), dtype) / (D ** 0.5),
                "b": jax.random.normal(
                    jax.random.fold_in(kl, 1), (r, V), dtype
                ) / (r ** 0.5),
            }
        if "--spec-resid-scale" in sys.argv:
            # calibrated-agreement sweep: scale the OUTPUT projections
            # (wo, w_down -> the residual contributions) of every layer
            # ABOVE the draft depth by alpha.  alpha=0 makes the upper
            # layers exact identities (draft argmax == target argmax:
            # acceptance 1.0 through the REAL verify/accept path, unlike
            # --spec-accept-all which bypasses it); alpha=1 is the honest
            # random-weight floor (~0).  Intermediate alphas land at
            # GENUINE measured acceptance rates with the full weight
            # stream unchanged, so the rows map the true RTF-vs-acceptance
            # envelope of the machinery — acceptance itself is a property
            # of the checkpoint, which this environment does not have
            # (see ARCHITECTURE.md speculative table).
            alpha = float(
                sys.argv[sys.argv.index("--spec-resid-scale") + 1]
            )
            d_cut = spec_kw["spec_draft_layers"]
            lyr = dict(params["llama"]["layers"])
            for kk in ("wo", "w_down"):
                wq = dict(lyr[kk])
                skey = "scale_a8" if "scale_a8" in wq else "scale"
                wq[skey] = wq[skey].at[d_cut:].multiply(alpha)
                lyr[kk] = wq
            params["llama"] = dict(params["llama"], layers=lyr)
            spec_kw["_resid_alpha"] = alpha  # tag only, popped below
        if "--spec-adapter-rank" in sys.argv:
            # random early-exit adapter (train/draft.py shape): with
            # random bench weights acceptance is ~0 either way, so this
            # row isolates the adapter's draft-step OVERHEAD — the cost
            # side of the acceptance-lift trade (created on device; the
            # tunnel upload of host arrays this size would dominate)
            r = int(sys.argv[sys.argv.index("--spec-adapter-rank") + 1])
            D = cfg.llama.hidden_size
            ka = jax.random.PRNGKey(7)
            spec_kw["spec_adapter"] = {
                "ln": jnp.ones((D,), dtype),
                "w1": jax.random.normal(ka, (D, r), dtype) * 0.02,
                "w2": jax.random.normal(
                    jax.random.fold_in(ka, 1), (r, D), dtype
                ) * 0.02,
            }
    if "--do-sample" in sys.argv:
        # sampling decode; with --speculative this is speculative
        # SAMPLING (exact in distribution, decode/speculative.py) — the
        # row measures its machinery cost on the DPO-collection path
        spec_kw.update(
            do_sample=True,
            temperature=(
                float(sys.argv[sys.argv.index("--temperature") + 1])
                if "--temperature" in sys.argv else 1.0
            ),
            top_k=(
                int(sys.argv[sys.argv.index("--top-k") + 1])
                if "--top-k" in sys.argv else 0
            ),
        )
    resid_alpha = spec_kw.pop("_resid_alpha", None)
    opts = InfiniSSTOptions(
        latency_multiplier=multiplier,
        beam=4,
        max_llm_cache_size=stream.max_llm_cache_tokens,
        quantize=quantize,
        **spec_kw,
    )
    agent = InfiniSSTAgent(params, cfg, stream, builder, opts, param_dtype=dtype)
    print("agent ready; first chunk will compile...", file=sys.stderr, flush=True)

    rng = np.random.RandomState(0)

    # --schedule 1,1,1,2,2,4,4: per-chunk latency multipliers — exercises
    # mid-stream update_multiplier (the system's dynamic latency control,
    # ref agents/infinisst.py:125-128) at full speed; RTF is then
    # time/audio per chunk averaged over the schedule tail.
    schedule = None
    if "--schedule" in sys.argv:
        schedule = [
            int(x)
            for x in sys.argv[sys.argv.index("--schedule") + 1].split(",")
        ]
        n_chunks = len(schedule)

    chunk_sec = agent.chunk_samples / 16000.0

    # --multi-stream [S]: variance-hardened headline — S distinct synthetic
    # streams (different seeds) x >=30 chunks each through ONE agent
    # (reset between streams; the compiled graphs are shared, so only
    # stream 0 pays the compile).  Reports the POOLED per-chunk RTF
    # distribution and per-stream means in one JSON artifact: the
    # single-stream 9-chunk headline sits ~5% under the 0.2 target with
    # ~4% run-to-run tunnel noise, so the driver needs the distribution,
    # not a point sample.
    if "--multi-stream" in sys.argv:
        idx = sys.argv.index("--multi-stream")
        n_streams = (
            int(sys.argv[idx + 1])
            if len(sys.argv) > idx + 1 and sys.argv[idx + 1].isdigit()
            else 3
        )
        per_stream = max(n_chunks, 30)
        pooled = []
        stream_means = []
        for s in range(n_streams):
            if s > 0:
                agent.reset()
            srng = np.random.RandomState(100 + s)
            stimes = []
            for i in range(per_stream):
                audio = srng.randn(agent.chunk_samples).astype(
                    np.float32) * 0.1
                # push() is the user-visible chunk latency (see the
                # single-stream loop below for why no per-chunk sync)
                t0 = time.perf_counter()
                agent.push(audio, finished=False)
                dt = time.perf_counter() - t0
                # only stream 0's first chunks pay compile/load
                if s > 0 or i >= warmup:
                    stimes.append(dt)
            jax.block_until_ready(agent.dec_state.k)  # untimed straggler sync
            srtfs = [t / chunk_sec for t in stimes]
            pooled.extend(srtfs)
            stream_means.append(float(np.mean(srtfs)))
            print(
                f"stream {s}: chunks={len(srtfs)} "
                f"mean={np.mean(srtfs):.4f} p95="
                f"{np.percentile(srtfs, 95):.4f}",
                file=sys.stderr, flush=True,
            )
        baseline_rtf = {1: 0.382, 2: 0.286, 3: 0.250, 4: 0.235}[multiplier]
        rtf = float(np.mean(pooled))
        result = {
            "metric": f"streaming_rtf_m{multiplier}_beam4_"
                      f"{tag}_multistream",
            "value": round(rtf, 4),
            "unit": "rtf",
            "vs_baseline": round(baseline_rtf / rtf, 3),
            "streams": n_streams,
            "chunks_per_stream": per_stream,
            "chunks_pooled": len(pooled),
            "rtf_median": round(float(np.median(pooled)), 4),
            "rtf_p95": round(float(np.percentile(pooled, 95)), 4),
            "rtf_p99": round(float(np.percentile(pooled, 99)), 4),
            "stream_means": [round(x, 4) for x in stream_means],
            "stream_mean_spread": round(
                max(stream_means) - min(stream_means), 4
            ),
        }
        print(json.dumps(result))
        return

    times = []
    rtfs = []
    evict_marks = []  # cumulative trim count after each timed chunk
    tokens_out = 0
    for i in range(n_chunks):
        if schedule is not None and schedule[i] != agent.opts.latency_multiplier:
            agent.update_multiplier(schedule[i])
        chunk = agent.chunk_samples
        audio = rng.randn(chunk).astype(np.float32) * 0.1
        # push() returns after fetching the chunk's emissions (host-
        # visible tokens) — the user-visible chunk latency.  Nothing runs
        # after it: eviction rides INSIDE the next chunk's compiled step
        # (agents/infinisst.py deferred trim), so a per-chunk
        # block_until_ready would only add one no-op tunnel RTT (~26 ms)
        # of measurement artifact.  A single trailing sync after the loop
        # catches stragglers.
        t0 = time.perf_counter()
        agent.push(audio, finished=False)
        dt = time.perf_counter() - t0
        print(
            f"chunk {i} (m={agent.opts.latency_multiplier}): {dt:.3f}s",
            file=sys.stderr, flush=True,
        )
        if i >= warmup:
            times.append(dt)
            rtfs.append(dt / (chunk / 16000.0))
            evict_marks.append(int(getattr(agent, "evictions", 0)))
    jax.block_until_ready(agent.dec_state.k)  # untimed straggler sync
    n_tok = len(agent.states.target_ids)

    if schedule is not None:
        # median: the first chunk at each new multiplier pays a ONE-TIME
        # per-process graph load/compile (the torch reference pays nothing
        # to switch but runs every chunk slower); report the steady-state
        # and surface the switch blips on stderr
        rtf = float(np.median(rtfs))
        result = {
            "metric": "streaming_rtf_mswitch_beam4_" + tag,
            "value": round(rtf, 4),
            "unit": "rtf",
            "vs_baseline": round(0.382 / rtf, 3),
        }
        print(json.dumps(result))
        print(
            f"schedule={schedule} chunks={len(times)} "
            f"per-chunk RTFs={[round(r,3) for r in rtfs]} "
            f"(mean incl. one-time switch blips: {np.mean(rtfs):.3f})",
            file=sys.stderr,
        )
        return

    # Robust mean: the dev service occasionally stalls a single mid-run
    # execution for seconds (observed ~10 s once in ~150 chunks).  At most
    # ONE chunk > 3x the median may be dropped — a one-off service hiccup
    # is filtered, a RECURRING stall (2+ outliers) is NOT and inflates the
    # mean as it should.  The drop is recorded IN the JSON artifact
    # (outliers_dropped / dropped_s) so the filtering is never silent, and
    # median/p95/untrimmed-mean RTFs are reported alongside.
    med = float(np.median(times))
    outliers = sorted(t for t in times if t > 3 * med)
    dropped = []
    kept = list(times)
    if len(outliers) == 1:
        kept.remove(outliers[0])
        dropped = [outliers[0]]
        print(
            f"dropped 1 outlier chunk (>{3*med:.2f}s, service hiccup): "
            f"{outliers[0]:.2f}s",
            file=sys.stderr, flush=True,
        )
    elif len(outliers) > 1:
        print(
            f"{len(outliers)} chunks exceed 3x median "
            f"({[round(t,2) for t in outliers]}): recurring stall, "
            "keeping ALL in the mean",
            file=sys.stderr, flush=True,
        )
    rtf = float(np.mean(kept)) / chunk_sec
    # En-De per-multiplier RTF on L40S (BASELINE.md, plot.ipynb cell 9)
    baseline_rtf = {1: 0.382, 2: 0.286, 3: 0.250, 4: 0.235}[multiplier]
    if spec_on:
        mode_tag = "spec" + (
            "_beam4" if opts.spec_beam else ""
        ) + (
            "_sample" if opts.do_sample else ""
        ) + (
            "_acceptall" if opts.spec_accept_all else ""
        ) + f"_d{opts.spec_draft_layers}k{opts.spec_k}" + (
            f"_hv{opts.spec_head_vocab // 1000}k"
            if opts.spec_head_vocab else ""
        ) + (
            f"_lr{opts.spec_lowrank_head['a'].shape[1]}"
            if opts.spec_lowrank_head is not None else ""
        ) + (
            f"_ada{opts.spec_adapter['w1'].shape[1]}"
            if opts.spec_adapter is not None else ""
        ) + (
            f"_ra{resid_alpha:g}" if resid_alpha is not None else ""
        )
        acc = (
            agent.spec_accepted / agent.spec_drafted
            if agent.spec_drafted else 0.0
        )
        result = {
            "metric": f"streaming_rtf_m{multiplier}_{mode_tag}_{tag}",
            "value": round(rtf, 4),
            "unit": "rtf",
            "vs_baseline": round(baseline_rtf / rtf, 3),
            "outliers_dropped": len(dropped),
            "dropped_s": [round(t, 3) for t in dropped],
            "rtf_untrimmed_mean": round(float(np.mean(times)) / chunk_sec, 4),
            "rtf_median": round(med / chunk_sec, 4),
            "rtf_p95": round(float(np.percentile(times, 95)) / chunk_sec, 4),
            "accept_rate": round(acc, 4),
            "rounds": agent.spec_rounds,
            "emitted": agent.spec_emitted,
            "guard_fallback": bool(agent.spec_fallback_active),
            # True when the trip used the background-AOT-warmed
            # executable (no synchronous compile stall in the stream)
            "fallback_warmed": bool(agent._fallback_compiled),
            "breakeven_tokens_per_round": (
                round(agent._spec_breakeven, 3)
                if agent._spec_breakeven is not None else None
            ),
        }
        print(json.dumps(result))
        print(
            f"spec: rounds={agent.spec_rounds} drafted={agent.spec_drafted} "
            f"accepted={agent.spec_accepted} emitted={agent.spec_emitted}",
            file=sys.stderr,
        )
        return
    dec_tag = "sample" if opts.do_sample else "beam4"
    result = {
        "metric": f"streaming_rtf_m{multiplier}_{dec_tag}_{tag}",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / rtf, 3),
        "outliers_dropped": len(dropped),
        "dropped_s": [round(t, 3) for t in dropped],
        "rtf_untrimmed_mean": round(float(np.mean(times)) / chunk_sec, 4),
        "rtf_median": round(med / chunk_sec, 4),
        "rtf_p95": round(float(np.percentile(times, 95)) / chunk_sec, 4),
    }
    if evict_marks and evict_marks[-1] > 0:
        # eviction-active steady state (VERDICT r4 weak #3): the
        # max_llm_cache_size trim fires mid-run; report RTF on both sides
        # of the FIRST trim.  Static shapes predict flatness — the evict
        # gather runs every chunk (identity operands pre-threshold) and
        # attention always spans the full cache capacity.
        first_ev = next(j for j, e in enumerate(evict_marks) if e > 0)
        pre = [r for r, t in zip(rtfs[:first_ev], times[:first_ev])
               if t not in dropped]
        post = [r for r, t in zip(rtfs[first_ev:], times[first_ev:])
                if t not in dropped]
        result["evictions"] = evict_marks[-1]
        result["first_evict_timed_chunk"] = first_ev
        if pre and post:
            result["rtf_pre_evict_mean"] = round(float(np.mean(pre)), 4)
            result["rtf_post_evict_mean"] = round(float(np.mean(post)), 4)
            result["evict_rtf_delta"] = round(
                float(np.mean(post)) - float(np.mean(pre)), 4
            )
    print(json.dumps(result))
    # extra diagnostics on stderr (driver reads stdout's single line)
    print(
        f"chunks={len(times)} mean={np.mean(times)*1e3:.1f}ms "
        f"p50={np.percentile(times,50)*1e3:.1f}ms "
        f"p90={np.percentile(times,90)*1e3:.1f}ms tokens={n_tok} "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def _tail_fields(slot_lat):
    """Per-slot per-chunk latency percentiles (ms): real-time streaming
    serving lives or dies on tails, not on mean tok/s."""
    if not slot_lat:
        return {}
    a = np.asarray(slot_lat) * 1e3
    return {
        "slot_chunk_p50_ms": round(float(np.percentile(a, 50)), 1),
        "slot_chunk_p95_ms": round(float(np.percentile(a, 95)), 1),
        "slot_chunk_p99_ms": round(float(np.percentile(a, 99)), 1),
        "slot_chunks_timed": len(slot_lat),
    }


def bench_serve(multiplier: int, n_chunks: int, pool: int = 8,
                model: str = "bench", beam: int = 4, multipliers=None,
                speculative: bool = False, spec_guard: bool = True,
                spec_resid_scale=None, spec_accept_all: bool = False,
                spec_head_vocab: int = 0, do_sample: bool = False,
                temperature: float = 1.0, top_k: int = 0):
    """Batched multi-client throughput: N concurrent streams through the
    serving engine; reports decode tokens/sec/chip and per-stream RTF.
    Default beam=4 — the reference's quality configuration
    (scripts/infer/infinisst.sh:42) — so throughput is quality-comparable;
    --beam 1 measures greedy.  --multipliers 1,2 runs a MIXED pool: half
    the slots at each multiplier, one shared weight stream per tick
    (clients at different latencies in one engine)."""
    import time

    import jax
    import jax.numpy as jnp

    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import bench_1chip_config
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W
    from infinisst_tpu.serve.engine import ServingEngine

    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    if model == "8b":
        from infinisst_tpu.core.presets import flagship_config
        from infinisst_tpu.models.quant import init_quantized_llama

        cfg = flagship_config()
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": init_quantized_llama(
                jax.random.fold_in(k, 2), cfg.llama,
                act_int8=True, lm_head_int8=True,
            ),
        }
        tag = "8b_int8"
    else:
        cfg = bench_1chip_config()
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
        }
        tag = "1chip"
    tok = StubTokenizer(cfg.llama.vocab_size)
    builders = {("English", "German"): PromptBuilder(tok, cfg.tokens)}
    if speculative and spec_resid_scale is not None:
        # calibrated-agreement point for the pool (see the stream-mode
        # --spec-resid-scale comment): scale the residual contributions
        # of layers above the engine's draft depth (8)
        d_cut = 8
        lyr = dict(params["llama"]["layers"])
        for kk in ("wo", "w_down"):
            wq = dict(lyr[kk])
            skey = "scale_a8" if "scale_a8" in wq else "scale"
            wq[skey] = wq[skey].at[d_cut:].multiply(spec_resid_scale)
            lyr[kk] = wq
        params["llama"] = dict(params["llama"], layers=lyr)
    if speculative:
        beam = 1  # spec serving is greedy-exact
    eng = ServingEngine(
        params, cfg, StreamConfig(), builders, pool_size=pool,
        multiplier=multiplier, dtype=dtype, beam=beam,
        multipliers=multipliers,
        speculative=speculative, spec_guard=spec_guard,
        spec_accept_all=spec_accept_all,
        spec_head_vocab=spec_head_vocab,
        do_sample=do_sample, temperature=temperature, top_k=top_k,
    )
    rng = np.random.RandomState(0)
    if multipliers:
        # mixed pool: slots round-robin over the multiplier set; audio
        # arrives in 960 ms units (real-time cadence) and each slot ticks
        # at its own m — one shared weight stream per engine tick
        ms = [multipliers[i % len(multipliers)] for i in range(pool)]
        slots = [
            eng.open_stream(f"c{i}", multiplier=ms[i]) for i in range(pool)
        ]
        unit = eng.stream.chunk_samples(1)
        m_max = max(multipliers)
        # warm up: every slot completes one of ITS chunks
        for _ in range(m_max):
            for s_ in slots:
                eng.push_audio(s_, rng.randn(unit).astype(np.float32) * 0.1)
            eng.tick()
        n_tok0 = sum(len(eng.slots[s_].target_ids) for s_ in slots)
        base_ticks = n_chunks * m_max  # in 960 ms units
        slot_lat = []  # per-slot per-chunk latency: tick wall when it fired
        t0 = time.perf_counter()
        for i in range(base_ticks):
            for s_ in slots:
                eng.push_audio(s_, rng.randn(unit).astype(np.float32) * 0.1)
            tt = time.perf_counter()
            eng.tick()
            dt = time.perf_counter() - tt
            # a slot "fired" if its chunk prefilled this tick
            # (eng.last_ticked — cache_len deltas can't tell once
            # deferred trims net growth to zero); in the mixed pool an
            # m=2 slot fires every other tick, so its chunk latency is
            # the wall of ITS tick, not the mean cadence
            for s_ in slots:
                if s_ in eng.last_ticked:
                    slot_lat.append(dt)
        jax.block_until_ready(eng.dec_state.k)
        wall = time.perf_counter() - t0
        n_tok = sum(len(eng.slots[s_].target_ids) for s_ in slots) - n_tok0
        audio_s = base_ticks * unit / 16000.0  # per stream
        mtag = "x".join(str(m) for m in multipliers)
        dmode = (
            f"spec{'S' if do_sample else ''}"
            f"{'AA' if spec_accept_all else ''}"
            f"d{eng.spec_draft_layers}k{eng.spec_k}"
            + (f"hv{spec_head_vocab // 1000}k" if spec_head_vocab else "")
            + (f"ra{spec_resid_scale:g}" if spec_resid_scale is not None
               else "")
            if speculative else f"beam{beam}"
        )
        result = {
            "metric": f"serve_decode_tok_per_s_pool{pool}_{dmode}_"
                      f"mixedm{mtag}_{tag}",
            "value": round(n_tok / wall, 2),
            "unit": "tok/s/chip",
            "vs_baseline": round((n_tok / wall) / 30.0, 3),
        }
        if speculative:
            st = eng.spec_stats
            result["accept_rate"] = round(
                st["accepted"] / max(st["drafted"], 1), 4
            )
            result["guard_fallback"] = bool(eng.spec_fallback_active)
            result["fallback_warmed"] = isinstance(
                eng._step_fn_fallback, jax.stages.Compiled
            )
        result["evictions"] = eng.evictions
        result.update(_tail_fields(slot_lat))
        print(json.dumps(result))
        print(
            f"MIXED pool={pool} m={ms} base_ticks={base_ticks} "
            f"wall={wall:.2f}s tokens={n_tok} "
            f"per-stream RTF={wall/audio_s:.3f}",
            file=sys.stderr,
        )
        return
    slots = [eng.open_stream(f"c{i}") for i in range(pool)]
    chunk = eng.chunk_samples

    # --churn: soak-mode client lifecycle churn — mid-run, two slots are
    # close_stream'd and immediately reopened as NEW clients (fresh
    # prompt, empty cache) while the other slots keep streaming; with a
    # long-enough soak the surviving slots also cross the per-slot
    # eviction threshold, so one row exercises trim + churn + steady
    # tails together (VERDICT r4 #4).
    churn = "--churn" in sys.argv

    # warm up one tick
    for s_ in slots:
        eng.push_audio(s_, rng.randn(chunk).astype(np.float32) * 0.1)
    eng.tick()

    base = {s_: len(eng.slots[s_].target_ids) for s_ in slots}
    tok_closed = 0
    churn_tick = n_chunks // 2 if churn else None
    slot_lat = []  # per-slot per-chunk latency (tail artifact)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        if churn_tick is not None and i == churn_tick:
            for s_ in slots[:2]:
                tok_closed += len(eng.slots[s_].target_ids) - base[s_]
                eng.close_stream(s_)
                ns = eng.open_stream(f"c{s_}_reopened")
                assert ns == s_, (ns, s_)
                base[s_] = 0
        for s_ in slots:
            eng.push_audio(s_, rng.randn(chunk).astype(np.float32) * 0.1)
        tt = time.perf_counter()
        eng.tick()
        dt = time.perf_counter() - tt
        for s_ in slots:
            if s_ in eng.last_ticked:
                slot_lat.append(dt)
    jax.block_until_ready(eng.dec_state.k)
    wall = time.perf_counter() - t0
    n_tok = tok_closed + sum(
        len(eng.slots[s_].target_ids) - base[s_] for s_ in slots
    )
    audio_s = n_chunks * chunk / 16000.0  # per stream
    dmode = (
        f"spec{'S' if do_sample else ''}"
        f"{'AA' if spec_accept_all else ''}"
        f"d{eng.spec_draft_layers}k{eng.spec_k}"
        + (f"hv{spec_head_vocab // 1000}k" if spec_head_vocab else "")
        if speculative else f"beam{beam}"
    )
    result = {
        "metric": f"serve_decode_tok_per_s_pool{pool}_{dmode}_m{multiplier}"
                  f"{'_churn' if churn else ''}_{tag}",
        "value": round(n_tok / wall, 2),
        "unit": "tok/s/chip",
        "vs_baseline": round((n_tok / wall) / 30.0, 3),  # target >=30 tok/s/chip
    }
    if churn:
        result["churn_tick"] = churn_tick
        result["evictions"] = eng.evictions
        half = len(slot_lat) // 2
        result["slot_chunk_p99_ms_first_half"] = round(
            float(np.percentile(np.asarray(slot_lat[:half]) * 1e3, 99)), 1
        )
        result["slot_chunk_p99_ms_second_half"] = round(
            float(np.percentile(np.asarray(slot_lat[half:]) * 1e3, 99)), 1
        )
    if speculative:
        st = eng.spec_stats
        result["accept_rate"] = round(
            st["accepted"] / max(st["drafted"], 1), 4
        )
        result["guard_fallback"] = bool(eng.spec_fallback_active)
        result["fallback_warmed"] = isinstance(
            eng._step_fn_fallback, jax.stages.Compiled
        )
    result.update(_tail_fields(slot_lat))
    print(json.dumps(result))
    print(
        f"pool={pool} chunks={n_chunks} wall={wall:.2f}s tokens={n_tok} "
        f"per-stream RTF={wall/audio_s:.3f} "
        + (f"spec={eng.spec_stats}" if speculative else ""),
        file=sys.stderr,
    )


def bench_streamatt(n_chunks: int = 40):
    """StreamAtt baseline-agent RTF on real TPU at 8B-int8: the reference's
    "Offline-checkpoint" streaming condition (scripts/infer/streamatt.sh) —
    full recompute of the (<=28.8 s, pruned) audio + target prefix each
    960 ms chunk, attention-guided emission.  Reference RTF on L40S:
    0.67-0.93 (StreamAtt+, plots cell 9 / BASELINE.md).  Audio buckets are
    coarse (10 chunks) so the one-time compile set is 3 audio shapes; the
    steady state (28.8 s cap) dominates the mean.  Chinese target mode so
    the stub tokenizer's word-boundary rules behave like a real stream."""
    import time

    import jax
    import jax.numpy as jnp

    from infinisst_tpu.agents.streamatt import (
        StreamAttAgent,
        StreamAttOptions,
    )
    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import flagship_config
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import wav2vec2 as W
    from infinisst_tpu.models.quant import init_quantized_llama

    cfg = flagship_config()
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
        "llama": init_quantized_llama(
            jax.random.fold_in(k, 2), cfg.llama, act_int8=True,
            lm_head_int8=True,
        ),
    }
    stream = StreamConfig()
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size), cfg.tokens)
    opts = StreamAttOptions(
        beam=4,
        target_lang="Chinese",
        frame_num=2,
        length_bucket_chunks=10,
        max_audio_chunks=30,
        attn_early_stop=True,  # in-loop attention stop (see AlignAttOptions)
    )
    agent = StreamAttAgent(params, cfg, stream, builder, opts,
                           param_dtype=dtype)
    print("agent ready; buckets will compile...", file=sys.stderr, flush=True)

    rng = np.random.RandomState(0)
    chunk = agent.unit_samples  # 960 ms reads (streamatt source segment)
    times = []
    for i in range(n_chunks):
        audio = rng.randn(chunk).astype(np.float32) * 0.1
        t0 = time.perf_counter()
        agent.push(audio, finished=False)
        dt = time.perf_counter() - t0
        print(f"chunk {i}: {dt:.3f}s tgt={len(agent.states.target_ids)}",
              file=sys.stderr, flush=True)
        # steady state = the 28.8 s-cap shape; skip all warmup/bucket-growth
        if i >= 32:
            times.append(dt)
    rtf = float(np.mean(times)) / 0.96
    result = {
        "metric": "streamatt_rtf_beam4_8b_int8",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(0.67 / rtf, 3),  # best reference StreamAtt+ RTF
    }
    print(json.dumps(result))
    print(
        f"chunks={len(times)} mean={np.mean(times)*1e3:.1f}ms "
        f"p90={np.percentile(times,90)*1e3:.1f}ms",
        file=sys.stderr,
    )


def bench_alignatt(n_chunks: int = 12, early_stop: bool = False):
    """AlignAtt baseline-agent RTF on real TPU at 8B-int8 (VERDICT r2
    #5b): full recompute of the (capped 28.8 s) audio + target prefix per
    960 ms chunk, attention-probed beam-4 emission (ref condition:
    scripts/infer/streamatt.sh:78-87; reference AlignAtt RTF on L40S sits
    in the StreamAtt band, plots cell 9).  ONE audio bucket (every chunk
    padded to the 28.8 s cap shape — the steady state IS the cap shape,
    so early chunks measuring it is conservative) and a 64-token target
    prefix window keep the 8B compile set to ~2 graphs.  --early-stop
    measures the in-loop attention stop (opt-in mode) on the same
    stream."""
    import time

    import jax
    import jax.numpy as jnp

    from infinisst_tpu.agents.alignatt import AlignAttAgent, AlignAttOptions
    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import flagship_config
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import wav2vec2 as W
    from infinisst_tpu.models.quant import init_quantized_llama

    cfg = flagship_config()
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
        "llama": init_quantized_llama(
            jax.random.fold_in(k, 2), cfg.llama, act_int8=True,
            lm_head_int8=True,
        ),
    }
    stream = StreamConfig()
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size), cfg.tokens)
    opts = AlignAttOptions(
        beam=4,
        frame_num=2,
        length_bucket_chunks=30,  # one bucket: every call at the cap shape
        max_audio_chunks=30,
        max_prompt_target_tokens=64,
        attn_early_stop=early_stop,
    )
    agent = AlignAttAgent(params, cfg, stream, builder, opts,
                          param_dtype=dtype)
    print("agent ready; cap shape will compile...", file=sys.stderr,
          flush=True)

    rng = np.random.RandomState(0)
    chunk = agent.unit_samples
    times = []
    warm = 3
    for i in range(n_chunks):
        audio = rng.randn(chunk).astype(np.float32) * 0.1
        t0 = time.perf_counter()
        agent.push(audio, finished=False)
        dt = time.perf_counter() - t0
        print(f"chunk {i}: {dt:.3f}s tgt={len(agent.states.target_ids)}",
              file=sys.stderr, flush=True)
        if i >= warm:
            times.append(dt)
    rtf = float(np.mean(times)) / 0.96
    tag = "es" if early_stop else "parity"
    result = {
        "metric": f"alignatt_rtf_beam4_{tag}_8b_int8",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(0.67 / rtf, 3),  # StreamAtt-band best ref RTF
    }
    print(json.dumps(result))
    print(
        f"chunks={len(times)} mean={np.mean(times)*1e3:.1f}ms "
        f"p90={np.percentile(times,90)*1e3:.1f}ms early_stop={early_stop}",
        file=sys.stderr,
    )


def bench_train(multiplier: int, n_steps: int = 12):
    """Training-step throughput on real TPU: the stage-1 recipe (frozen
    LLM, trainable encoder+adapter; ref scripts/train/stage1.sh) on the
    1.5B-class config with reference-scale shapes — 28.8 s document
    windows (30*960 ms, the trajectory re-slicing bound,
    /root/reference/preprocess/build_trajectory_full_mfa.py:180-224) and a
    ~1.2k-token batch (the reference's SpeechSampler token budget,
    train/dataset.py:223-248).  Metric: speech seconds trained per
    second per chip (vs_baseline: x realtime).  The multi-chip dp+ZeRO
    train step is exercised by __graft_entry__.dryrun_multichip."""
    import time

    import jax
    import jax.numpy as jnp

    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import bench_1chip_config
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W
    from infinisst_tpu.train import step as tstep

    cfg = bench_1chip_config()
    stream = StreamConfig()
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
    }
    freeze = tstep.FreezeConfig.stage1()
    tx = tstep.make_optimizer(
        tstep.OptimConfig(learning_rate=2e-4, warmup_steps=1000,
                          total_steps=100_000),
        params, freeze,
    )
    state = tstep.init_train_state(params, tx)

    # 28.8 s windows, 360 speech tokens each, ~240 target tokens
    B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 2
    n_frames = 48 * 30  # 1440 frames = 28.8 s
    n_samples = 399 + n_frames * 320
    sp = n_frames // 4
    S = sp + 240
    rng = np.random.RandomState(0)
    ids = np.full((B, S), 7, np.int32)
    ids[:, 2: 2 + sp] = 1008
    labels = np.where(np.arange(S)[None] >= sp + 4, ids, -100)
    step_fn = jax.jit(
        tstep.make_train_step(
            cfg, tx, 48, stream.max_cache_frames, multiplier=multiplier,
            freeze=freeze, remat=True,
        ),
        donate_argnums=(0,),
    )

    def make_batch(i):
        return tstep.Batch(
            speech=jnp.asarray(
                rng.randn(B, n_samples).astype(np.float32) * 0.1
            ),
            frame_lengths=jnp.full((B,), n_frames, jnp.int32),
            input_ids=jnp.asarray(ids),
            labels=jnp.asarray(labels.astype(np.int32)),
            attention_mask=jnp.ones((B, S), jnp.int32),
            patch_mask=jnp.asarray(ids == 1008),
        )

    print("compiling train step...", file=sys.stderr, flush=True)
    times = []
    warmup = 2
    for i in range(n_steps):
        # the ~3.7 MB speech upload must complete BEFORE the timer starts —
        # on the dev tunnel the async transfer is the same magnitude as the
        # step itself and would masquerade as compute (a real input
        # pipeline overlaps uploads with the previous step)
        batch = jax.block_until_ready(make_batch(i))
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        print(f"step {i}: {dt:.3f}s loss={float(metrics['loss']):.3f}",
              file=sys.stderr, flush=True)
        if i >= warmup:
            times.append(dt)

    speech_s = B * n_frames * 0.02  # 20 ms per frame
    sps = speech_s / float(np.mean(times))
    result = {
        "metric": "train_stage1_speech_s_per_s_1chip_1.5b",
        "value": round(sps, 2),
        "unit": "speech_s/s/chip",
        "vs_baseline": round(sps / 1.0, 2),  # x realtime per chip
    }
    print(json.dumps(result))
    print(
        f"B={B} window=28.8s steps={len(times)} "
        f"mean={np.mean(times)*1e3:.0f}ms", file=sys.stderr,
    )


def bench_train_io(n_steps: int = 12):
    """End-to-end stage-1 training throughput WITH the real input
    pipeline: on-disk TSV + wav dataset -> SpeechSampler -> trajectory
    collator -> Trainer._prefetch (depth 2: host reads + collate + upload
    overlap the device step) -> train step on the real TPU.

    The device-only row (bench --mode train, 183 speech-s/s/chip) excludes
    batch preparation and upload by construction; this row includes
    everything, so (train-io / train) measures how much of the input
    pipeline the prefetch actually hides (ref: the torch reference hides
    it behind DataLoader num_workers, train/main.py).  Shapes mirror the
    device-only row: 28.8 s windows (30 x 960 ms trajectory steps), two
    rows per batch.  encoder_dropout=0 to keep the step graph identical
    to the device-only row."""
    import time

    import jax
    import jax.numpy as jnp

    from infinisst_tpu.core.presets import bench_1chip_config
    from infinisst_tpu.data.audio import write_wav
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W
    from infinisst_tpu.train.trainer import Trainer, TrainerArgs

    cfg = bench_1chip_config()
    tok = StubTokenizer(cfg.llama.vocab_size)
    builder = PromptBuilder(tok, cfg.tokens)

    # on-disk dataset: enough 28.8 s rows for n_steps 2-row batches
    d = "/tmp/bench_train_io"
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    n_units, words_per_unit = 30, 8
    n_rows = 2 * (n_steps + 5)  # n_steps timed + 2 warmup + 2 probe
    rows = []
    for i in range(n_rows):
        wav_path = os.path.join(d, f"r{i}.wav")
        n_samples = n_units * 15360
        if not os.path.exists(wav_path):
            write_wav(
                wav_path,
                (rng.randn(n_samples) * 0.1).astype(np.float32),
            )
        steps = [
            " ".join(
                f"w{rng.randint(400)}" for _ in range(words_per_unit)
            )
            for _ in range(n_units)
        ]
        rows.append(
            {
                "id": f"r{i}",
                "audio": wav_path,
                "n_frames": str(n_samples),
                "src_text": " ".join(steps),
                "tgt_text": " ".join(steps),
                "trajectory": repr(steps),
            }
        )
    import csv

    with open(os.path.join(d, "tr.tsv"), "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=list(rows[0].keys()), delimiter="\t",
            quotechar=None, doublequote=False, lineterminator="\n",
            quoting=csv.QUOTE_NONE,
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)

    args = TrainerArgs(
        data_path=d,
        data_split_train="tr",
        data_split_eval="none",
        trajectory=4,
        trajectory_max_multiplier=1,
        stage=1,
        train_bsz=1900,  # eff ~939/row at 28.8 s -> 2 rows/batch
        bsz_sent=2,
        warmup_steps=100,
        max_steps=n_steps,
        grad_acc_steps=1,
        log_step=10**9,
        eval_step=0,
        save_step=0,
        save_dir=os.path.join(d, "run"),
        block_size=48,
        max_cache_size=576,
        encoder_dropout=0.0,
    )
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
    }
    t = Trainer(args, cfg, builder, params)
    ds, sampler, collator = t._make_loader("tr", args.train_bsz, True)
    sampler.set_epoch(0)

    print("compiling train step (train-io)...", file=sys.stderr, flush=True)
    # Two regimes over one stream of real batches:
    #   warmup (2 steps, synced)  — pays compile, excluded
    #   timed (n_steps, PIPELINED) — steps dispatched back-to-back with
    #     ONE final sync, exactly how Trainer.fit runs between log points
    #     (it fetches loss only every log_step); per-step synced latency
    #     is also reported from the warmup+probe steps for reference.
    state = t.state
    synced_times = []
    speech_s = []
    losses = []
    warmup = 2
    probe = 2  # extra per-step-synced steps after warmup
    t_start = None
    timed_speech = 0.0
    n_timed = 0
    with t.mesh:
        t_prev = time.perf_counter()
        for i, (m, batch) in enumerate(
            t._prefetch(sampler, ds, collator, depth=2)
        ):
            sec = float(np.asarray(batch.frame_lengths).sum()) * 0.02
            state, metrics = t._get_step_fn(m)(state, batch)
            if i < warmup + probe:
                jax.block_until_ready(metrics["loss"])
                now = time.perf_counter()
                dt = now - t_prev
                t_prev = now
                print(
                    f"step {i} (synced): {dt:.3f}s speech="
                    f"{batch.speech.shape} S={batch.input_ids.shape} "
                    f"audio_s={sec:.1f} loss={float(metrics['loss']):.3f}",
                    file=sys.stderr, flush=True,
                )
                if i >= warmup:
                    synced_times.append(dt)
                    speech_s.append(sec)
                if i == warmup + probe - 1:
                    t_start = time.perf_counter()
            else:
                losses.append(metrics["loss"])
                timed_speech += sec
                n_timed += 1
                if n_timed >= n_steps:
                    break
    jax.block_until_ready(losses)
    total = time.perf_counter() - t_start
    final_loss = float(losses[-1])
    print(
        f"pipelined: {n_timed} steps in {total:.2f}s "
        f"({timed_speech:.1f} audio_s) final_loss={final_loss:.3f}",
        file=sys.stderr, flush=True,
    )
    sps = timed_speech / total
    sync_sps = float(np.sum(speech_s)) / float(np.sum(synced_times))
    result = {
        "metric": "train_stage1_speech_s_per_s_realio_1chip_1.5b",
        "value": round(sps, 2),
        "unit": "speech_s/s/chip",
        "vs_baseline": round(sps / 1.0, 2),
        "pipeline": "disk TSV+wav -> sampler -> collator -> prefetch(2) "
                    "-> upload -> steps dispatched back-to-back, one "
                    "final sync (Trainer.fit's regime between log points)",
        "steps_pipelined": n_timed,
        "sec_per_step_pipelined": round(total / n_timed, 4),
        "sec_per_step_synced": round(float(np.mean(synced_times)), 4),
        "speech_s_per_s_synced": round(sync_sps, 2),
        "final_loss": round(final_loss, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # The dev TPU service occasionally reports a transient
    # RESOURCE_EXHAUSTED right after a previous client exits (server-side
    # allocations not yet reclaimed).  Retry once in a fresh process
    # before giving up so a single flake doesn't record a failed bench.
    import os

    if os.environ.get("_BENCH_RETRIED") != "1":
        try:
            main()
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" in str(e) or "ResourceExhausted" in str(e):
                print(
                    "transient RESOURCE_EXHAUSTED; retrying once in 60s",
                    file=sys.stderr, flush=True,
                )
                time.sleep(60)
                os.environ["_BENCH_RETRIED"] = "1"
                os.execv(sys.executable, [sys.executable] + sys.argv)
            raise
    else:
        main()
