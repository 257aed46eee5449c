"""Memory-plan pins (VERDICT r3 next #4).

The committed artifact docs/memplan_8b.json is produced by tools_memplan
at flagship scale (minutes of CPU compile); here the same planner runs at
dryrun scale to pin that (a) the stage-2 train step AOT-lowers with the
production GSPMD shardings, (b) the requested specs survive lowering
(no fallback-to-replicated on the heavy leaves), and (c) the committed
8B artifact names a mesh that fits v5e (16 GiB/chip).
"""

import json
import os

import pytest

from infinisst_tpu.core.presets import dryrun_config

import tools_memplan


@pytest.mark.slow
def test_planner_lowers_with_sharded_heavy_leaves():
    row = tools_memplan.plan_mesh(
        dryrun_config(), 4, 2, rows_per_dp=1, audio_s=2.0, seq_len=32,
        multiplier=1, block_frames=48, max_cache_frames=96,
    )
    assert row["peak_hbm_bytes_per_device"] > 0
    assert row["zero"] is True
    # every heavy leaf kept a mesh axis (not replicated): GSPMD did not
    # override the requested param shardings at lowering time
    for name, spec in row["heavy_leaf_specs"].items():
        assert "data" in spec or "model" in spec, (name, spec)


def test_committed_8b_memplan_names_a_fitting_mesh():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "docs", "memplan_8b.json")
    with open(path) as f:
        plan = json.load(f)
    assert plan["hbm_budget_gib_per_chip"] == 16
    rec = plan["recommendation"]
    fitting = {m["mesh"] for m in plan["meshes"] if m["fits_v5e_16gib"]}
    assert rec in fitting, (rec, fitting)
    rows = {m["mesh"]: m for m in plan["meshes"]}
    assert rows[rec]["peak_hbm_gib_per_device"] < 16
    # the plan covers the three candidate meshes the recipe considers
    assert {"dp8xtp1", "dp4xtp2", "dp2xtp4"} <= set(rows)
