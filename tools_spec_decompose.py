"""Decompose the speculative DRAFT step cost on hardware (8B-int8).

The shortlist-head A/B (ARCHITECTURE.md) found the 16k shortlist saves
10% at acceptance-0 m=1 but nothing at the one-round ceiling — implying
the per-draft-step cost at B=1 is mostly NOT the head stream.  This tool
measures the decomposition directly, in-jit (lax.scan with a
data-dependent token chain, double-warmed against the tunnel's
first-fresh-execution artifact — same discipline as
tools_ab_attention.py):

  draft_full   one draft decode_step: d int8 layers + full W8A8 lm_head
               (128k-pad) + the production processor stack + argmax
  draft_hv     same with a 16k shortlist head (prefix pad re-entry)
  draft_raw    same as draft_hv but plain argmax (no processors) —
               isolates the processor-stack cost
  verify       one verify forward: all 32 layers over S=k+1 positions
               (the full weight stream the draft amortises)

at B in {1, 8} (single-stream agent vs serving pool).  Expected
structure: draft_full - draft_hv ~ the 0.46 GB head-stream delta
(~0.6 ms), draft_hv - draft_raw ~ the processor cost, and the remainder
vs the ~d/32 weight-stream floor is XLA op overhead at S=1 shapes.

  python tools_spec_decompose.py [--iters 30] [--json docs/spec_decompose.json]
Run bare (real TPU); ~8 GB HBM; each new shape costs one server compile.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from infinisst_tpu.core.presets import flagship_config
from infinisst_tpu.decode import logits as lp
from infinisst_tpu.decode.speculative import make_draft_head
from infinisst_tpu.models import llama as L
from infinisst_tpu.models.quant import init_quantized_llama
from infinisst_tpu.streaming.state import init_decoder_state

CACHE = 1280  # flagship llm_cache_capacity
START = 600  # tokens already in cache when the chunk decodes
TBUF = 700
NGRAM = 5
REP = 1.2


def build(cfg):
    params = init_quantized_llama(
        jax.random.PRNGKey(0), cfg.llama, act_int8=True, lm_head_int8=True
    )
    return params


def draft_params(params, cfg, d, hv):
    pd = {
        "embed": params["embed"],
        "layers": jax.tree.map(lambda a: a[:d], params["layers"]),
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
    }
    cfg_d = dataclasses.replace(cfg.llama, num_layers=d)
    if hv:
        dh = make_draft_head(params["lm_head"], hv)
        pd["lm_head"] = dh["w"]
        cfg_d = dataclasses.replace(cfg_d, vocab_size=hv)
    return pd, cfg_d


def bench_step(params, cfg, d, hv, B, iters, processors=True, verify_s=0):
    """us per step.  verify_s > 0 benches the full-depth verify forward
    over S positions instead of a draft step."""
    full_cfg = cfg.llama
    V = full_cfg.vocab_size
    if verify_s:
        pd, cfg_d = params, full_cfg
        nl = full_cfg.num_layers
        S = verify_s
    else:
        pd, cfg_d = draft_params(params, cfg, d, hv)
        nl = d
        S = 1

    dec0 = init_decoder_state(
        nl, B, CACHE, full_cfg.num_kv_heads, full_cfg.head_dim, jnp.bfloat16
    )
    dec0 = dec0._replace(valid_len=jnp.full((B,), START, jnp.int32))
    seq_buf = jnp.zeros((B, TBUF), jnp.int32)
    seq_len = jnp.full((B,), START % TBUF, jnp.int32)
    hist = jnp.zeros((B, 100), jnp.int32)
    hist_len = jnp.zeros((B,), jnp.int32)

    def proc(scores_v):
        s = jax.nn.log_softmax(scores_v.astype(jnp.float32), axis=-1)
        s = lp.repetition_penalty(
            s, seq_buf, jnp.arange(TBUF)[None] < seq_len[:, None], REP
        )
        s = lp.no_repeat_ngram(s, seq_buf, seq_len, NGRAM)
        s = lp.encoder_no_repeat_ngram(
            s, hist, hist_len, seq_buf, seq_len, NGRAM
        )
        return jnp.argmax(s, axis=-1).astype(jnp.int32)

    # params/state are jit ARGUMENTS, never closure constants: baked-in
    # constants ship inside the remote compile request (multi-GB upload /
    # HTTP 413 on this tunnel — same rule as tools_ab_attention.py)
    @jax.jit
    def loop(pd, tok0, dec):
        def body(carry, _):
            dec, tok = carry
            emb = L.embed(pd, jnp.tile(tok[:, None], (1, S)))
            lg, _dec2 = L.decode_step(pd, cfg_d, dec, emb)
            # keep the cache length FIXED across iterations (reuse dec),
            # feeding only the token back — steps stay data-dependent and
            # shape-identical
            scores = lg[:, -1, : cfg_d.vocab_size]
            if not verify_s and hv:
                scores = jnp.pad(
                    scores, ((0, 0), (0, V - hv)), constant_values=-1e9
                ).astype(scores.dtype)
            elif not verify_s:
                scores = scores[:, :V]
            if processors:
                nxt = proc(scores)
            else:
                nxt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            return (dec, nxt), nxt[0]
        (_, tok), probe = jax.lax.scan(
            body, (dec, tok0), jnp.arange(iters)
        )
        return tok, probe

    t0s = [jnp.full((B,), 11 + i, jnp.int32) for i in range(3)]
    jax.block_until_ready(loop(pd, t0s[0], dec0))
    jax.block_until_ready(loop(pd, t0s[1], dec0))  # first-fresh-input warm
    t0 = time.perf_counter()
    jax.block_until_ready(loop(pd, t0s[2], dec0))
    return (time.perf_counter() - t0) / iters * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--batches", type=str, default="1,8")
    args = ap.parse_args()

    cfg = flagship_config()
    params = build(cfg)
    jax.block_until_ready(params["lm_head"]["q"])

    rows = []
    for B in (int(x) for x in args.batches.split(",")):
        row = {"B": B}
        cells = [
            ("draft_full_d8", dict(d=8, hv=0)),
            ("draft_hv16k_d8", dict(d=8, hv=16384)),
            ("draft_hv16k_d8_raw", dict(d=8, hv=16384, processors=False)),
            ("draft_full_d4", dict(d=4, hv=0)),
            ("verify_s5", dict(d=0, hv=0, verify_s=5)),
        ]
        for name, kw in cells:
            try:
                us = bench_step(params, cfg, B=B, iters=args.iters, **kw)
                row[name] = round(us, 1)
            except Exception as e:  # noqa: BLE001
                row[name] = f"ERR {type(e).__name__}"
                print(f"{name} B={B}: {e}", file=sys.stderr)
            print(f"B={B} {name}: {row[name]} us", file=sys.stderr,
                  flush=True)
        rows.append(row)

    print(json.dumps(rows, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
