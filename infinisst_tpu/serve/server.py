"""Multi-client streaming translation server (newline-delimited JSON over
TCP; the websocket-demo equivalent of the reference's serving path).

Protocol (one JSON object per line):
  client -> server:
    {"type": "open", "source_lang": "English", "target_lang": "German",
     "multiplier": 1}   # optional; must be in the server's --multipliers set
    {"type": "audio", "pcm": [float...], "finished": false}
    {"type": "close"}
  server -> client:
    {"type": "opened", "slot": N}
    {"type": "text", "content": "...", "final": false}
    {"type": "error", "message": "..."}

The engine tick loop runs in a background task at the chunk cadence; all
clients share one batched jitted step (serve/engine.py).

Run:  python -m infinisst_tpu.serve.server --port 8765 [--model-preset ...]
Test client: infinisst_tpu/serve/client.py
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json

import numpy as np

READLINE_LIMIT = 16 * 1024 * 1024


class StreamingServer:
    def __init__(self, engine, tick_interval: float = 0.1):
        self.engine = engine
        self.tick_interval = tick_interval
        self.slot_writers = {}

    async def tick_loop(self):
        loop = asyncio.get_event_loop()
        while True:
            out = await loop.run_in_executor(None, self.engine.tick)
            for slot, text in out.items():
                writer = self.slot_writers.get(slot)
                s = self.engine.slots[slot]
                if writer is not None:
                    msg = {
                        "type": "text",
                        "content": text,
                        "final": s.done,
                    }
                    writer.write((json.dumps(msg) + "\n").encode())
                    try:
                        await writer.drain()
                    except ConnectionError:
                        pass
                if s.done:
                    self.engine.close_stream(slot)
                    self.slot_writers.pop(slot, None)
            await asyncio.sleep(self.tick_interval)

    async def handle(self, reader, writer):
        slot = None
        try:
            while True:
                line = await reader.readline()
                if not line:
                    break
                msg = json.loads(line)
                if msg["type"] == "open":
                    pair = (
                        msg.get("source_lang", "English"),
                        msg.get("target_lang", "German"),
                    )
                    try:
                        slot = self.engine.open_stream(
                            str(writer.get_extra_info("peername")), pair,
                            multiplier=msg.get("multiplier"),
                        )
                    except ValueError as e:
                        writer.write(
                            (json.dumps(
                                {"type": "error", "message": str(e)}
                            ) + "\n").encode()
                        )
                        await writer.drain()
                        continue
                    self.slot_writers[slot] = writer
                    writer.write(
                        (json.dumps({"type": "opened", "slot": slot}) + "\n")
                        .encode()
                    )
                    await writer.drain()
                elif msg["type"] == "audio" and slot is not None:
                    if "pcm_b64" in msg:
                        pcm = (
                            np.frombuffer(
                                base64.b64decode(msg["pcm_b64"]), np.int16
                            ).astype(np.float32)
                            / 32768.0
                        )
                    else:
                        pcm = np.asarray(msg["pcm"], np.float32)
                    self.engine.push_audio(
                        slot, pcm, finished=msg.get("finished", False)
                    )
                elif msg["type"] == "close":
                    break
        except (json.JSONDecodeError, KeyError) as e:
            writer.write(
                (json.dumps({"type": "error", "message": str(e)}) + "\n")
                .encode()
            )
        finally:
            if slot is not None and slot in self.slot_writers:
                self.engine.close_stream(slot)
                self.slot_writers.pop(slot, None)
            writer.close()

    async def run(self, host: str, port: int):
        server = await asyncio.start_server(
            self.handle, host, port, limit=READLINE_LIMIT
        )
        tick = asyncio.create_task(self.tick_loop())
        async with server:
            await server.serve_forever()


def _head_ids(args):
    """Validated --spec-head-ids loading (same rules as agents/cli.py)."""
    from infinisst_tpu.agents.cli import _load_head_ids

    return _load_head_ids(args.spec_head_ids, args.spec_head_vocab, np)


def _adapter(args):
    """Validated --spec-adapter loading (same rules as agents/cli.py)."""
    from infinisst_tpu.agents.cli import _load_adapter

    return _load_adapter(args)


def _lowrank(args):
    """Validated --spec-lowrank-head loading (same rules as cli.py)."""
    import numpy as np

    from infinisst_tpu.agents.cli import _load_lowrank_head

    return _load_lowrank_head(args, np)


def main():  # pragma: no cover - network entrypoint
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--pool-size", type=int, default=8)
    p.add_argument("--multiplier", type=int, default=1,
                   help="default latency multiplier for clients that do "
                   "not request one")
    p.add_argument("--multipliers", type=str, default=None,
                   help="comma list of ALLOWED per-client multipliers "
                   "(e.g. 1,2,4); one pool serves all of them mixed")
    p.add_argument("--beam", type=int, default=4,
                   help="beam width per slot (the reference's quality "
                   "configuration is beam 4; 1 = batched greedy)")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 int8 decode weights (fits the 8B flagship "
                   "on one 16 GB chip)")
    p.add_argument("--suppress-non-language", action="store_true")
    # speculative pooled serving (greedy-exact, forces beam=1): layer-skip
    # draft + k-token verify shared across the pool; --spec-head-vocab
    # slices a shortlist draft head (--spec-head-ids: .npy of
    # corpus-frequency-ranked ids, default id prefix)
    p.add_argument("--speculative", action="store_true")
    p.add_argument("--spec-draft-layers", type=int, default=8)
    p.add_argument("--spec-k", type=int, default=4)
    p.add_argument("--spec-head-vocab", type=int, default=0)
    p.add_argument("--spec-head-ids", type=str, default=None)
    # npz from train.draft.save_adapter (depth-checked vs draft layers)
    p.add_argument("--spec-adapter", type=str, default=None)
    # low-rank draft head: rank builds SVD factors from the loaded
    # lm_head; path loads prebuilt {'a','b'} factors (exact either way)
    p.add_argument("--spec-lowrank-rank", type=int, default=0)
    p.add_argument("--spec-lowrank-head", type=str, default=None)
    # pool-wide acceptance guard (ON by default; see agents/cli.py)
    p.add_argument("--spec-no-guard", action="store_true")
    p.add_argument("--spec-guard-patience", type=int, default=3)
    # opt out of the guard's background AOT warm of the fallback
    # graph (on by default: a trip then swaps without a compile stall)
    p.add_argument("--spec-no-warm-fallback", action="store_true")
    # pooled speculative SAMPLING (requires --speculative): per-row
    # ancestral-sampling semantics at speculative speed
    p.add_argument("--do-sample", action="store_true")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--epsilon-cutoff", type=float, default=0.0)
    p.add_argument("--sample-seed", type=int, default=0)
    p.add_argument("--model-preset", default="bench")
    p.add_argument("--state-dict-path", default=None)
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument(
        "--lang-pairs",
        default="English-German,English-Spanish,English-Chinese",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import (
        bench_1chip_config,
        dryrun_config,
        flagship_config,
    )
    from infinisst_tpu.data.template import (
        HFTokenizerAdapter,
        PromptBuilder,
        StubTokenizer,
    )
    from infinisst_tpu.serve.engine import ServingEngine
    from infinisst_tpu.train.main import build_params

    cfg = {
        "flagship": flagship_config,
        "bench": bench_1chip_config,
        "dryrun": dryrun_config,
    }[args.model_preset]()
    if args.tokenizer_path:
        from transformers import AutoTokenizer

        from infinisst_tpu.data.template import register_special_tokens

        tok = AutoTokenizer.from_pretrained(args.tokenizer_path, use_fast=False)
        register_special_tokens(tok, cfg)
        tokenizer = HFTokenizerAdapter(tok)
    else:
        tokenizer = StubTokenizer(cfg.llama.vocab_size)

    builders = {}
    for pair in args.lang_pairs.split(","):
        src, tgt = pair.split("-")
        builders[(src, tgt)] = PromptBuilder(tokenizer, cfg.tokens, src, tgt)

    class _A:
        llm_path = None
        w2v2_path = None
        sllm_weight_path = args.state_dict_path

    params = build_params(_A, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if args.int8:
        ll = cfg.llama
        dims = (
            ll.num_heads * ll.head_dim, ll.num_kv_heads * ll.head_dim,
            ll.hidden_size, ll.intermediate_size,
        )
        if any(d % 128 for d in dims):
            raise SystemExit(
                f"--int8 requires all projection dims to be multiples of "
                f"128 (got {dims} for preset {args.model_preset!r}); use "
                "the flagship/bench presets or drop --int8"
            )
        from infinisst_tpu.models.quant import quantize_llama_params

        params = dict(params)
        params["llama"] = quantize_llama_params(
            params["llama"], quantize_lm_head=True, act_int8=True
        )
    suppress = None
    if args.suppress_non_language:
        if not args.tokenizer_path:
            print(
                "WARNING: --suppress-non-language needs --tokenizer-path "
                "to scan the vocab; ban list DISABLED",
                file=__import__("sys").stderr, flush=True,
            )
        else:
            from infinisst_tpu.agents.cli import build_suppress_list

            suppress = build_suppress_list(tokenizer)
    engine = ServingEngine(
        params, cfg, StreamConfig(), builders,
        pool_size=args.pool_size, multiplier=args.multiplier,
        beam=1 if args.speculative else args.beam,
        suppress_tokens=suppress,
        multipliers=(
            tuple(int(x) for x in args.multipliers.split(","))
            if args.multipliers else None
        ),
        speculative=args.speculative,
        spec_draft_layers=args.spec_draft_layers,
        spec_k=args.spec_k,
        spec_head_vocab=args.spec_head_vocab,
        spec_head_ids=_head_ids(args),
        spec_adapter=_adapter(args),
        spec_lowrank_rank=args.spec_lowrank_rank,
        spec_lowrank_head=_lowrank(args),
        spec_guard=not args.spec_no_guard,
        spec_guard_patience=args.spec_guard_patience,
        spec_warm_fallback=not args.spec_no_warm_fallback,
        do_sample=args.do_sample,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        epsilon_cutoff=args.epsilon_cutoff,
        sample_seed=args.sample_seed,
    )
    asyncio.run(StreamingServer(engine).run(args.host, args.port))


if __name__ == "__main__":
    main()
