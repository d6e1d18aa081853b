"""Multi-process ("multi-host") CPU dryrun worker.

Each process owns K virtual CPU devices (one "host" of a slice); the
batch ('dp') axis spans processes — the DCN dimension — and the RNS limb
('rp') axis stays inside each process — the ICI dimension — per the
topology rule in toyfhe_tpu/parallel/distributed.py. The worker builds
the SAME rp-sharded square→relin→rescale step as the single-process
dryrun, runs it over the global 2-host mesh (collectives ride Gloo), and
checks the result bit-exactly against the unsharded single-chip step.

Spawned by ``__graft_entry__.dryrun_multihost`` with:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=K \
      python tools/dryrun_multihost.py PROC_ID NPROC PORT
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, nproc: int, port: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from toyfhe_tpu.parallel import distributed as D

    D.init_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    k = jax.local_device_count()

    import numpy as np
    from toyfhe_tpu.parallel import ops as pops
    import __graft_entry__ as GE

    n_dp, n_rp = nproc, k
    limbs_per_shard = 2
    L = n_rp * limbs_per_shard
    # identical deterministic build in every process (SPMD requires it)
    ring, masks, maskeds, batch = GE._build(
        n_ring=32, logqs=tuple([28] * L), batch=2 * n_dp, seed=3)

    mesh = D.make_hybrid_mesh(n_rp=n_rp, n_dp=n_dp)
    # verify the DCN placement: every 'rp' column must live in ONE process
    devgrid = np.asarray(mesh.devices)
    for row in range(devgrid.shape[0]):
        procs = {d.process_index for d in devgrid[row].ravel()}
        assert len(procs) == 1, "rp axis crossed a process boundary"

    step, place = pops.make_sharded_step(mesh, ring.tables, masks, maskeds)
    out = step(place(batch))
    jax.block_until_ready(out)

    # bit-exact vs the unsharded single-chip step
    ref_step = pops.make_single_chip_step(ring.tables, np.asarray(masks),
                                          np.asarray(maskeds))
    ref = np.asarray(ref_step(np.asarray(batch)))
    for shard in out.addressable_shards:
        got = np.asarray(shard.data)
        want = ref[shard.index]
        assert got.shape == want.shape
        assert np.array_equal(got, want), "sharded result diverged"

    print(f"dryrun_multihost OK: proc {pid}/{nproc} mesh=({n_dp}x{n_rp}) "
          f"L={L} local_devices={k} bit-exact vs single-chip", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
