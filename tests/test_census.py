"""Strategy × mode multi-chip census (dvae_tpu/parallel/census.py).

The full 18-cell matrix lives in the committed MULTICHIP_CENSUS.json
(scripts/multichip_census.py) and a budget-bounded prefix re-runs in the
driver dry run; here we test the machinery itself — one real production
compile cell, the analytic ring-model checks on synthetic stats, and the
budget accounting — without paying the full matrix.
"""

import dataclasses

import jax
import pytest

from dvae_tpu.config import MeshConfig, ShardingStrategy
from dvae_tpu.parallel import census
from dvae_tpu.parallel.collective_cost import CollectiveStats
from dvae_tpu.parallel.sharding import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, arm=2, fsdp=2))


def test_production_row_full_shard_mse(mesh):
    """The headline cell: production-shape FULL_SHARD/MSE compile must be
    warning-free and ring-model consistent (the round-1 regression class:
    sharding pressure at the fused-kernel boundary degenerating into
    replicate-then-repartition)."""
    row = census.production_row(ShardingStrategy.FULL_SHARD, "MSE", mesh)
    assert row.warnings == []
    assert row.analytic_ok, row.analytic_why
    assert row.counts.get("all-gather", 0) >= 1      # sharded params
    assert (row.counts.get("all-reduce", 0)
            + row.counts.get("reduce-scatter", 0)) >= 1  # grad reduction
    # the REPORTED per-step wire bytes must clear the analytic gradient-
    # traffic lower bound — the rolled step loop means the HLO census is
    # already per-step; a physically-impossible row (reported < bound,
    # as a division by steps once produced) must never ship again
    import jax as _jax

    from dvae_tpu.train.step import init_train_state, make_optimizer
    cfg = census.production_cfg("MSE")
    tx = make_optimizer(cfg)
    shapes = _jax.eval_shape(
        lambda: init_train_state(_jax.random.key(0), cfg, tx))
    bound = census.grad_traffic_lower_bound(shapes.params, mesh)
    assert row.wire_bytes >= 0.9 * bound, (row.wire_bytes, bound)


def _stats(counts, wire):
    return CollectiveStats(counts=dict(counts), bytes_by_kind={},
                           wire_bytes=wire)


class TestAnalyticCheck:
    def test_ok(self, mesh):
        ok, why = census.analytic_check(
            ShardingStrategy.FULL_SHARD,
            _stats({"all-gather": 4, "all-reduce": 2}, 1e9), 1e8, mesh)
        assert ok, why

    def test_missing_allgather_flagged(self, mesh):
        ok, why = census.analytic_check(
            ShardingStrategy.FULL_SHARD,
            _stats({"all-reduce": 2}, 1e9), 1e8, mesh)
        assert not ok and "all-gather" in why

    def test_missing_grad_reduction_flagged(self, mesh):
        ok, why = census.analytic_check(
            ShardingStrategy.DDP, _stats({"all-gather": 1}, 1e9), 1e8, mesh)
        assert not ok and "gradient-reduction" in why

    def test_wire_below_bound_flagged(self, mesh):
        ok, why = census.analytic_check(
            ShardingStrategy.DDP,
            _stats({"all-reduce": 2}, 1e6), 1e8, mesh)
        assert not ok and "lower bound" in why

    def test_single_device_group_trivial(self):
        mesh1 = make_mesh(MeshConfig(data=1, arm=1, fsdp=1),
                          devices=jax.devices()[:1])
        ok, why = census.analytic_check(
            ShardingStrategy.FULL_SHARD, _stats({}, 0.0), 0.0, mesh1)
        assert ok and "g=1" in why


def test_grad_traffic_lower_bound_ring_formula(mesh):
    import numpy as np

    params = {"w": np.zeros((4, 10, 10), np.float32)}  # arm-divisible lead
    got = census.grad_traffic_lower_bound(params, mesh)
    # g = data·fsdp = 4; arm=2 halves the per-device volume; bf16 floor 2B
    want = 2.0 * (4 - 1) / 4 * (400 // 2) * 2
    assert got == want


def test_run_census_budget_zero_skips_everything(mesh):
    logs = []
    summary = census.run_census(mesh, budget_s=0.0, log=logs.append)
    assert summary["rows"] == [] and summary["equality"] == {}
    # clean now REQUIRES at least one executed equality cell (round-3
    # verdict): a census that ran nothing is not a clean record
    assert summary["clean"] is False
    assert len(summary["skipped"]) == 21  # 18 prod cells + 3 small modes


def test_census_cells_priority_order():
    cells = census.census_cells()
    assert len(cells) == 21  # 18 prod (6 strategies × 3 modes) + 3 small
    # the headline FULL_SHARD column runs first with the EXECUTED MSE
    # equality cell right after the headline compile — before any other
    # cell; everything else lives in the rotated pool
    head = [(k, getattr(s, "value", None), m) for k, s, m in cells[:4]]
    assert head == [("prod", "full", "MSE"), ("small", None, "MSE"),
                    ("prod", "full", "ZINB"), ("prod", "full", "aug")]
    assert len(set(cells)) == 21


def test_census_cells_ledger_rotates_stalest_first():
    """The staleness ledger reorders the non-headline pool: never-verified
    cells first (production compiles outranking equality cells at equal
    staleness), then ascending last-verified tick — so budget-bounded
    rounds sweep the whole matrix instead of a static prefix."""
    ledger = {"grad-op/MSE": 4, "no/MSE": 4, "hybrid/MSE": 4,
              "hybrid-zero2/MSE": 3, "ddp/MSE": 3,
              "grad-op/ZINB": 3, "no/ZINB": 3, "hybrid/ZINB": 3,
              "hybrid-zero2/ZINB": 3}
    cells = census.census_cells(ledger=ledger)
    names = [f"{k}:{s.value if s else '-'}/{m}" for k, s, m in cells]
    # heads fixed
    assert names[:4] == ["prod:full/MSE", "small:-/MSE",
                         "prod:full/ZINB", "prod:full/aug"]
    # never-verified production cells come next (ddp/ZINB + the aug
    # strategies), then the never-run equality cells, then tick-3 cells,
    # then the freshest (tick-4) cells last
    assert names[4] == "prod:ddp/ZINB"
    assert set(names[5:10]) == {"prod:grad-op/aug", "prod:no/aug",
                                "prod:hybrid/aug",
                                "prod:hybrid-zero2/aug", "prod:ddp/aug"}
    assert names[10:12] == ["small:-/ZINB", "small:-/aug"]
    assert names[-3:] == ["prod:grad-op/MSE", "prod:no/MSE",
                          "prod:hybrid/MSE"]


def test_run_census_ledger_roundtrip(tmp_path):
    """run_census writes back ticks for every landed cell; a rerun with
    that ledger demotes them to the end of the pool."""
    import json

    p = tmp_path / "ledger.json"
    p.write_text(json.dumps({"ddp/MSE": 1}))
    ledger = json.loads(p.read_text())
    cells = census.census_cells(ledger=ledger)
    pool = [f"{k}:{s.value if s else '-'}/{m}" for k, s, m in cells[4:]]
    assert pool[-1] == "prod:ddp/MSE"


def test_committed_census_matrix_is_full_and_clean():
    """MULTICHIP_CENSUS.json (the durable record scripts/multichip_census.py
    writes) must carry the complete clean matrix."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..",
                        "MULTICHIP_CENSUS.json")
    with open(path) as f:
        d = json.load(f)
    assert d["clean"] is True and d["skipped"] == []
    assert len(d["rows"]) == 18
    assert set(d["equality"]) == {"MSE", "ZINB", "aug"}
    for r in d["rows"]:
        assert r["warnings"] == [] and r["analytic_ok"], r
