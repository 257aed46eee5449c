"""Tensor-parallel agent test: the full streaming agent (fused chunk step,
beam search, eviction) runs with model-axis-sharded parameters on the
virtual 8-device mesh — the single-host version of the 8B TP serving path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.agents.infinisst import InfiniSSTAgent, InfiniSSTOptions
from infinisst_tpu.core.config import StreamConfig
from infinisst_tpu.core.presets import dryrun_config
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
from infinisst_tpu.parallel import mesh as pmesh

from tests.test_agent import small_special_tokens


@pytest.mark.slow
def test_agent_with_tp_sharded_params():
    assert len(jax.devices()) >= 4
    cfg = dryrun_config()  # head counts divisible by model=4
    # dryrun vocab is 1024; line the special tokens up under it
    from infinisst_tpu.core.config import SpecialTokens

    tokens = SpecialTokens(
        bos=1000, eot=1001, eos=1001, start_header=1002, end_header=1003,
        pad=1004, user=1005, assistant=1006, newline2=1007, sp_patch=1008,
        sp_start=1009, sp_end=1010, latency=(1011, 1012, 1013, 1014),
    )
    cfg = cfg.replace(tokens=tokens)

    import __graft_entry__ as ge

    params = ge._tiny_params(cfg, jnp.float32)
    mesh = pmesh.make_mesh(data=1, model=4)
    specs = pmesh.model_param_specs(cfg, zero=False)
    params = pmesh.shard_params(params, mesh, specs)

    stream = StreamConfig(
        max_cache_frames=96, max_llm_cache_tokens=80, llm_cache_capacity=192
    )
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900),
                            tokens)
    opts = InfiniSSTOptions(
        latency_multiplier=1, beam=2, max_llm_cache_size=80,
        no_repeat_ngram_lookback=16,
    )
    agent = InfiniSSTAgent(
        params, cfg, stream, builder, opts, param_dtype=jnp.float32
    )
    rng = np.random.RandomState(0)
    with mesh:
        for i in range(4):
            act = agent.push(
                rng.randn(agent.chunk_samples).astype(np.float32) * 0.1,
                finished=(i == 3),
            )
    assert not act.is_read() and act.finished
    assert int(agent.enc_state.n_frames[0]) == 4 * 48
    # params stayed sharded over the model axis through the run
    sh = params["llama"]["layers"]["wq"].sharding
    assert "model" in str(sh.spec)
