"""Multi-host readiness: DCN-aware mesh, jax.distributed init path,
communication-volume model validated against the compiled HLO, and the
2-process CPU dryrun (VERDICT round-1 item 4; SURVEY §5.8)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

import __graft_entry__ as GE
from toyfhe_tpu.parallel import distributed as D
from toyfhe_tpu.parallel import ops as pops


def test_make_hybrid_mesh_single_process():
    mesh = D.make_hybrid_mesh(n_rp=4, n_dp=2)
    assert mesh.axis_names == ("dp", "rp")
    assert np.asarray(mesh.devices).shape == (2, 4)
    with pytest.raises(ValueError):
        D.make_hybrid_mesh(n_rp=64, n_dp=2)


def test_init_distributed_single_process_noop():
    # no coordinator, no process count: must not touch the backend state
    D.init_distributed()
    assert jax.process_count() == 1


def test_comm_model_matches_compiled_hlo():
    """The predicted collective sites must match what XLA actually emits
    for the rp-sharded step: one all-gather for the key-switch digit
    share + one for the rescale broadcast, with the predicted shapes."""
    n_dp, n_rp, limbs_per_shard = 2, 4, 2
    L = n_rp * limbs_per_shard
    n_ring = 32
    batch = 2 * n_dp
    ring, masks, maskeds, cts = GE._build(n_ring=n_ring,
                                          logqs=tuple([28] * L), batch=batch)
    from toyfhe_tpu.parallel import sharding as S
    mesh = S.make_mesh(n_rp=n_rp, n_dp=n_dp, devices=jax.devices()[:8])
    step, place = pops.make_sharded_step(mesh, ring.tables, masks, maskeds)
    placed = place(cts)
    txt = jax.jit(step).lower(placed).compile().as_text()
    counts = D.count_hlo_collectives(txt)

    model = D.sharded_step_comm_model(
        n=n_ring, L=L, n_rp=n_rp, batch_per_dev=batch // n_dp)
    want_ag = sum(1 for s in model.values() if s.kind == "all-gather")
    assert counts.get("all-gather", 0) == want_ag, (counts, txt[:0])

    # payload prediction vs the actual per-shard contributions in the HLO
    ks = model["keyswitch_digit_share"]
    assert ks.bytes_per_shard == (batch // n_dp) * limbs_per_shard * n_ring * 4
    rb = model["rescale_broadcast"]
    assert rb.bytes_per_shard == (batch // n_dp) * 2 * n_ring * 4
    got = D.hlo_allgather_payloads(txt)
    want = sorted(s.bytes_per_shard for s in model.values())
    assert got == want, (got, want)


def test_comm_model_matches_compiled_hlo_2axis():
    """Round-2 VERDICT item 8: the 3-axis (dp×rp×cp) step's predicted
    collective sites — four all_to_all over 'cp' (one per four-step
    transform call) + the two 'rp' all-gathers — must match the
    compiled HLO in count AND payload."""
    from jax.sharding import Mesh
    from toyfhe_tpu.ops import ntt_mxu as mxu

    n_dp, n_rp, n_cp = 2, 2, 2
    limbs_per_shard = 2
    L = n_rp * limbs_per_shard
    n_ring = 128 * 2 * n_cp
    batch = 2 * n_dp
    ring, masks, maskeds, cts = GE._build(
        n_ring=n_ring, logqs=tuple([28] * L), batch=batch)
    mt = mxu.MxuNttTables(ring.tables)
    devs = np.asarray(jax.devices()[:8]).reshape(n_dp, n_rp, n_cp)
    mesh = Mesh(devs, ("dp", "rp", "cp"))
    step, place, _ = pops.make_2axis_step(mesh, mt, masks, maskeds,
                                          n_cp=n_cp, dp=True)
    txt = step.lower(place(cts)).compile().as_text()
    counts = D.count_hlo_collectives(txt)

    model = D.step2axis_comm_model(n=n_ring, L=L, n_rp=n_rp, n_cp=n_cp,
                                   batch_per_dev=batch // n_dp)
    want_a2a = sum(s.count for s in model.values()
                   if s.kind == "all-to-all")
    want_ag = sum(s.count for s in model.values() if s.kind == "all-gather")
    assert counts.get("all-to-all", 0) == want_a2a, counts
    assert counts.get("all-gather", 0) == want_ag, counts
    got_a2a = D.hlo_alltoall_payloads(txt)
    want = sorted(s.bytes_per_shard for s in model.values()
                  if s.kind == "all-to-all")
    assert got_a2a == want, (got_a2a, want)
    got_ag = D.hlo_allgather_payloads(txt)
    want_g = sorted(s.bytes_per_shard for s in model.values()
                    if s.kind == "all-gather")
    assert got_ag == want_g, (got_ag, want_g)


def test_predicted_scaling_curve():
    """The published 1→N-host curve: with 'dp' across hosts the step
    exchanges nothing over DCN, so predicted weak-scaling efficiency is
    flat and far above the ≥80% BASELINE target; the anti-pattern
    (collectives spanning DCN) visibly degrades."""
    curve = D.predicted_scaling_curve(
        hosts=[1, 2, 4, 8, 16], chips_per_host=4, n=1 << 13, L=8,
        batch_per_chip=4, t_step_chip_s=0.58e-3, n_cp=1)
    assert all(e > 0.95 for _, e in curve), curve
    assert all(abs(e - curve[0][1]) < 1e-9 for _, e in curve[1:])
    anti = D.predicted_scaling_curve(
        hosts=[1, 2, 4, 8, 16], chips_per_host=4, n=1 << 13, L=8,
        batch_per_chip=4, t_step_chip_s=0.58e-3, n_cp=1,
        dp_across_hosts=False)
    assert anti[-1][1] < curve[-1][1]


def test_dryrun_multihost_2proc():
    """Spawn 2 real processes; collectives cross the process boundary
    (the DCN stand-in); result bit-exact vs the single-chip step."""
    GE.dryrun_multihost(n_processes=2, devices_per_process=4)
