"""A/B shape grid: Pallas decode-attention kernels vs the XLA path.

VERDICT r2 #7: the Pallas kernels (kernels/decode_attention.py) lost to
XLA at the flagship decode shapes (cache 1280) in round 1 A/Bs and are
dormant on production paths; this tool commits the evidence — a grid over
cache length x pool size at the 8B attention geometry (H=32, KV=8,
Dh=128, bf16 cache), timing each implementation INSIDE one jitted
lax.scan (per-dispatch timing on the dev tunnel measures only dispatch
overhead; the backend also memoizes identical executions, so the query
varies per iteration).

  python tools_ab_attention.py [--iters 50] [--json out.json]

Implementations:
  xla     decode_attention_reference — the einsum rotate-on-read path,
          semantically identical to the production decode step's
          attention (models/llama.py:142-153)
  pallas  kernels.decode_attention (vmapped per (batch, kv-head))
  pallasb kernels.decode_attention_batched (one call per batch element)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from infinisst_tpu.core import rope as R
from infinisst_tpu.kernels.decode_attention import (
    decode_attention,
    decode_attention_batched,
    decode_attention_reference,
)

H, KV, Dh = 32, 8, 128


def bench_cell(impl, B, C, iters):
    k = jax.random.PRNGKey(0)
    cache_k = jax.random.normal(k, (B, C, KV, Dh), jnp.bfloat16) * 0.1
    cache_v = jax.random.normal(
        jax.random.fold_in(k, 1), (B, C, KV, Dh), jnp.bfloat16
    ) * 0.1
    valid = jnp.full((B,), C - 7, jnp.int32)
    qpos = jnp.full((B,), C - 7, jnp.int32)
    inv_freq = jnp.asarray(
        R.llama_rope_freqs(Dh, 500000.0, False, 1.0, 1.0, 1.0, 8192),
        jnp.float32,
    )

    fn = {
        "xla": decode_attention_reference,
        "pallas": decode_attention,
        "pallasb": decode_attention_batched,
    }[impl]

    # caches are ARGUMENTS, not closure constants: baked-in constants are
    # shipped inside the remote compile request (HTTP 413 at 0.5 GB)
    @jax.jit
    def loop(q0, ck, cv):
        def body(q, i):
            out = fn(q, ck, cv, valid, qpos, inv_freq)
            # feed the output back so iterations are data-dependent (the
            # compiler cannot elide or overlap-collapse them) and vary
            q = (q0 + out.astype(q0.dtype) * 1e-3).astype(q0.dtype)
            return q, out[0, 0, 0]
        q, probe = jax.lax.scan(body, q0, jnp.arange(iters))
        return q, probe

    q0 = jax.random.normal(jax.random.fold_in(k, 2), (B, H, Dh), jnp.bfloat16)
    # compile + warm TWICE with distinct inputs: on this memoizing tunnel
    # backend the first FRESH-input execution of a new executable carries
    # several ms of one-time service work, which otherwise pollutes the
    # measurement (observed: the first cell per batch size read ~8 ms
    # regardless of shape)
    jax.block_until_ready(loop(q0, cache_k, cache_v))
    jax.block_until_ready(loop(q0 * 1.0002, cache_k, cache_v))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(q0 * 1.0001, cache_k, cache_v))
    dt = time.perf_counter() - t0
    return dt / iters * 1e6  # us per attention step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--impls", type=str, default="xla,pallas,pallasb")
    ap.add_argument("--cells", type=str,
                    default="1280:1,1280:8,1280:16,4096:1,4096:8,4096:16,"
                            "16384:1,16384:8,16384:16")
    args = ap.parse_args()

    rows = []
    for cell in args.cells.split(","):
        C, B = (int(x) for x in cell.split(":"))
        row = {"cache": C, "pool": B}
        for impl in args.impls.split(","):
            try:
                us = bench_cell(impl, B, C, args.iters)
                row[impl] = round(us, 1)
            except Exception as e:  # noqa: BLE001
                row[impl] = f"ERR {type(e).__name__}"
                print(f"{impl} C={C} B={B}: {e}", file=sys.stderr)
            print(f"C={C} B={B} {impl}: {row[impl]} us", file=sys.stderr,
                  flush=True)
        rows.append(row)

    print(json.dumps(rows, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
