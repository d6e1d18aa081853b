"""Multi-host (multi-process) readiness: jax.distributed init, DCN-aware
mesh construction, and the per-collective communication-volume model.

The reference is single-process (SURVEY §2.9 — no Distributed.jl/MPI);
this layer is new design. The topology rule (scaling-book recipe): put
the axes that communicate per-step — residue ('rp') and coefficient
('cp') — INSIDE a host/slice so their collectives ride ICI, and put
batch ('dp') ACROSS hosts, since ciphertext-batch parallelism
communicates nothing per step (each ciphertext's pipeline is
independent; only key broadcast at setup crosses DCN).

CPU multi-process validation: ``tools/dryrun_multihost.py`` /
``__graft_entry__.dryrun_multihost`` spawn N local processes with
virtual CPU devices, initialize the coordination service, and run the
real sharded step over the global mesh (collectives ride Gloo — the
same program topology that rides ICI/DCN on a pod).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Initialize the multi-process runtime (idempotent).

    Thin policy wrapper over ``jax.distributed.initialize``: with no
    arguments, relies on the cluster environment auto-detection (TPU
    pods set everything); explicit arguments drive CPU/GPU multi-process
    runs (tests, the dryrun). No-op when already initialized or when
    called single-process with no coordinator.
    """
    import jax

    # NB: must not touch the backend (jax.devices/process_count) before
    # initialize — probe the coordination client instead.
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes in (None, 1):
        return                       # single-process run: nothing to do
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def make_hybrid_mesh(n_rp: int, n_dp: int = 1, n_cp: int = 1,
                     devices: Optional[Sequence] = None):
    """('dp','rp'[,'cp']) mesh, DCN-aware across processes.

    Multi-process: 'dp' is laid across the process (DCN) dimension and
    'rp'/'cp' within each process's devices (ICI), via
    ``mesh_utils.create_hybrid_device_mesh``. Falls back to a plain
    reshape for single-process (the virtual-mesh tests).
    """
    import jax
    from jax.sharding import Mesh
    from jax.experimental import mesh_utils

    axes = ("dp", "rp") if n_cp == 1 else ("dp", "rp", "cp")
    shape = (n_dp, n_rp) if n_cp == 1 else (n_dp, n_rp, n_cp)
    total = math.prod(shape)
    devices = list(devices if devices is not None else jax.devices())[:total]
    if len(devices) != total:
        raise ValueError(f"need {total} devices, have {len(devices)}")
    nproc = len({getattr(d, "process_index", 0) for d in devices})
    if nproc > 1:
        per_proc = total // nproc
        if n_dp % nproc:
            raise ValueError(
                f"dp={n_dp} must be a multiple of process count {nproc}: "
                "the batch axis is the only axis that may cross DCN")
        ici = (n_dp // nproc,) + shape[1:]
        dcn = (nproc,) + (1,) * (len(shape) - 1)
        assert math.prod(ici) == per_proc
        dev_mesh = mesh_utils.create_hybrid_device_mesh(
            ici, dcn, devices=devices, process_is_granule=True)
        return Mesh(dev_mesh, axes)
    return Mesh(np.asarray(devices).reshape(shape), axes)


# ---------------------------------------------------------------------------
# Communication-volume model (validated against compiled HLO)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CollectiveSite:
    """One collective in the sharded step, with its predicted payload."""
    name: str          # site label
    kind: str          # all-gather | all-to-all | psum (all-reduce)
    count: int         # invocations per step
    bytes_per_shard: int   # payload each device contributes per invocation

    @property
    def total_bytes(self) -> int:
        return self.count * self.bytes_per_shard


def sharded_step_comm_model(n: int, L: int, n_rp: int, batch_per_dev: int = 1,
                            ncomp: int = 2, dtype_bytes: int = 4
                            ) -> Dict[str, CollectiveSite]:
    """Predicted collectives for the rp-sharded square→relin→rescale step
    (parallel/ops.py::make_sharded_step), per device, per step.

    Derivation from the reference's data flow (SURVEY §5.8):
      * key-switch digit sharing (rlwe_she.jl:340-344): every limb's
        centered digit lift must reach every limb's accumulator — ONE
        all_gather of the local digit block, payload B·(L/n_rp)·N values
        per device (the ct's last tensor component, limb-sharded);
      * rescale broadcast (crt.jl:215-220): the dropped limb's residues
        reach the surviving limbs — ONE all_gather of each component's
        local last row, payload B·ncomp·1·N values per device.
    Batch multiplies payloads; 'dp' communicates nothing per step.
    """
    per_limb_row = n * dtype_bytes
    local_rows = -(-L // n_rp)
    sites = {
        "keyswitch_digit_share": CollectiveSite(
            "keyswitch_digit_share", "all-gather", 1,
            batch_per_dev * local_rows * per_limb_row),
        "rescale_broadcast": CollectiveSite(
            "rescale_broadcast", "all-gather", 1,
            batch_per_dev * ncomp * per_limb_row),
    }
    return sites


def coeff_ntt_comm_model(n: int, L_local: int, n_cp: int,
                         batch_per_dev: int = 1, dtype_bytes: int = 4,
                         transforms: int = 1) -> Dict[str, CollectiveSite]:
    """Coefficient-sharded four-step NTT (parallel/sharding.py): one
    all_to_all per transform, payload = the device's full local block
    (N/n_cp values per limb row) re-partitioned across 'cp'."""
    payload = batch_per_dev * L_local * (n // n_cp) * dtype_bytes
    return {"ntt_stage_exchange": CollectiveSite(
        "ntt_stage_exchange", "all-to-all", transforms, payload)}


def step2axis_comm_model(n: int, L: int, n_rp: int, n_cp: int,
                         batch_per_dev: int = 1, ndig: Optional[int] = None,
                         ncomp: int = 2, dtype_bytes: int = 4
                         ) -> Dict[str, CollectiveSite]:
    """Predicted collectives for the dp×rp×cp sharded
    square→relin→rescale step (parallel/ops.py::make_2axis_step),
    per device per step.

    The coefficient axis adds ONE all_to_all over 'cp' per four-step
    transform call (parallel/sharding.py::mxu2_ntt_local/intt_local):
    intt(d3), ntt(digits), intt(out), ntt(result) — with the digit
    tensor carrying an extra ``ndig`` axis. The two 'rp' all-gather
    sites are the 1-axis step's (rlwe_she.jl:340-344, crt.jl:215-220)
    at 1/n_cp the row length. 'dp' communicates nothing per step.

    ``bytes_per_shard`` is the device's full local block entering the
    collective; wire traffic per device is (size−1)/size of it for
    all_to_all and all-gather alike.
    """
    ndig = L if ndig is None else ndig
    l_loc = -(-L // n_rp)
    n_loc = n // n_cp
    blk = batch_per_dev * l_loc * n_loc * dtype_bytes
    return {
        "ntt_d3_exchange": CollectiveSite(
            "ntt_d3_exchange", "all-to-all", 1, blk),
        "ntt_digit_exchange": CollectiveSite(
            "ntt_digit_exchange", "all-to-all", 1, ndig * blk),
        "ntt_out_exchange": CollectiveSite(
            "ntt_out_exchange", "all-to-all", 1, ncomp * blk),
        "ntt_result_exchange": CollectiveSite(
            "ntt_result_exchange", "all-to-all", 1, ncomp * blk),
        "keyswitch_digit_share": CollectiveSite(
            "keyswitch_digit_share", "all-gather", 1, blk),
        "rescale_broadcast": CollectiveSite(
            "rescale_broadcast", "all-gather", 1,
            batch_per_dev * ncomp * n_loc * dtype_bytes),
    }


def predicted_scaling_curve(hosts: Sequence[int], chips_per_host: int,
                            n: int, L: int, batch_per_chip: int,
                            t_step_chip_s: float,
                            n_rp: Optional[int] = None,
                            n_cp: int = 1,
                            ici_bw: float = 4 * 45e9,
                            dcn_bw: float = 25e9,
                            dp_across_hosts: bool = True) -> list:
    """Predicted weak-scaling efficiency of the sharded step, 1 chip →
    N hosts, from the validated comm-volume model.

    Topology rule (docs/parallelism.md): 'rp'/'cp' INSIDE a host (their
    collectives ride ICI, default 4 links × 45 GB/s/chip), 'dp' ACROSS
    hosts — batch parallelism exchanges nothing per step, so DCN
    carries zero step traffic and host count drops out of the model.
    ``dp_across_hosts=False`` models the anti-pattern (the 'rp'
    all-gathers ride DCN, default one 200 Gb/s NIC per host) to show
    why the rule matters.

    Efficiency baseline is the serial chip: eff = t_compute /
    (t_compute + t_comm); t_compute = per-chip step time at
    ``batch_per_chip`` (weak scaling — per-device work constant).
    Returns [(n_hosts, efficiency), ...].
    """
    n_rp = chips_per_host // n_cp if n_rp is None else n_rp
    if n_cp > 1:
        model = step2axis_comm_model(n, L, n_rp, n_cp, batch_per_chip)
    else:
        model = sharded_step_comm_model(n, L, n_rp, batch_per_chip)
    out = []
    for nh in hosts:
        t_comm = 0.0
        for s in model.values():
            size = n_rp if "gather" in s.kind else n_cp
            wire = s.total_bytes * (size - 1) / max(size, 1)
            if dp_across_hosts or nh == 1:
                t_comm += wire / ici_bw
            else:
                # anti-pattern: the collective group spans hosts; the
                # per-host NIC carries the whole group's traffic
                t_comm += wire * chips_per_host / dcn_bw
        out.append((nh, t_step_chip_s / (t_step_chip_s + t_comm)))
    return out


def pipeline_scaling_curve(hosts: Sequence[int], chips_per_host: int,
                           n: int, L: int, n_keyswitches: int,
                           t_pipeline_chip_s: float,
                           n_rp: Optional[int] = None,
                           ici_bw: float = 4 * 45e9,
                           dcn_bw: float = 25e9,
                           dp_across_hosts: bool = True) -> list:
    """Predicted weak-scaling efficiency of the SHARDED SERVING PIPELINE
    (models/mnist.py::build_inference_pipeline with a mesh), 1 chip → N
    hosts, composed from the validated per-step comm model.

    The pipeline is a sequence of keyswitch-class steps (the BSGS dense
    layers' hoisted rotations + the two squares' relinearizations —
    2·(bs+gs−2)+2 ≈ 30 at the reference shape, infer.jl:135-167) whose
    'rp' all-gathers ride ICI; the remaining limb-local work (conv grid
    muls, diagonal muls, bias/rescales) is comm-free and sits inside
    ``t_pipeline_chip_s``. 'dp' (the 49-ct grid / channel / batch axis,
    infer.jl:115-124) communicates nothing, so host count drops out
    under the dp-across-hosts topology rule (docs/parallelism.md).

    Returns [(n_hosts, efficiency), ...] with efficiency = t_serial /
    (t_serial + t_comm) per pipeline invocation.
    """
    n_rp = chips_per_host if n_rp is None else n_rp
    model = sharded_step_comm_model(n, L, n_rp, batch_per_dev=1)
    out = []
    for nh in hosts:
        t_comm_step = 0.0
        for s in model.values():
            wire = s.total_bytes * (n_rp - 1) / max(n_rp, 1)
            if dp_across_hosts or nh == 1:
                t_comm_step += wire / ici_bw
            else:
                t_comm_step += wire * chips_per_host / dcn_bw
        t_comm = n_keyswitches * t_comm_step
        out.append((nh, t_pipeline_chip_s /
                    (t_pipeline_chip_s + t_comm)))
    return out


_HLO_COLLECTIVE_RE = re.compile(
    r"(all-gather|all-to-all|all-reduce|collective-permute)")


_SHAPE_RE = re.compile(r"[a-z]+(8|16|32|64)\[([\d,]*)\]")


def hlo_alltoall_payloads(compiled_text: str) -> list:
    """Per-device block bytes of every all-to-all in compiled HLO,
    sorted. XLA decomposes a tiled all_to_all over a size-k group into a
    k-operand tuple op — the device's full exchanged block is the SUM of
    the tuple element sizes."""
    out = []
    for line in compiled_text.splitlines():
        if "-start" in line or " all-to-all(" not in line:
            continue
        lhs = line.split(" all-to-all(")[0]
        total = 0
        for m in _SHAPE_RE.finditer(lhs):
            bits = int(m.group(1))
            dims = [int(d) for d in m.group(2).split(",") if d]
            total += math.prod(dims) * (bits // 8)
        if total:
            out.append(total)
    return sorted(out)


_AG_LINE_RE = re.compile(
    r"=\s*\(?[a-z]+(8|16|32|64)\[([\d,]*)\][^=]*\ball-gather\b[^(]*\("
    r".*replica_groups=\{\{([\d,]+)\}")


def hlo_allgather_payloads(compiled_text: str) -> list:
    """Per-shard contributed bytes of every all-gather in compiled HLO:
    result_bytes / replica_group_size (the validation counterpart of
    :func:`sharded_step_comm_model`'s bytes_per_shard)."""
    out = []
    for line in compiled_text.splitlines():
        m = _AG_LINE_RE.search(line)
        if m and "-start" not in line:
            bits = int(m.group(1))
            dims = [int(d) for d in m.group(2).split(",") if d]
            group = len(m.group(3).split(","))
            out.append(math.prod(dims) * (bits // 8) // group)
    return sorted(out)


def count_hlo_collectives(compiled_text: str) -> Dict[str, int]:
    """Count collective ops in compiled HLO text (validation hook: the
    predicted site counts must match what XLA actually emitted)."""
    counts: Dict[str, int] = {}
    for line in compiled_text.splitlines():
        line = line.strip()
        if line.startswith("ROOT"):
            line = line[4:].lstrip()
        # opcode appears as "<name> = <type> opcode(" — require the
        # following '(' so operand names like get-tuple-element's
        # "(%all-to-all)" don't count
        m = re.search(r"=\s*[^=]*?\s(all-gather|all-to-all|all-reduce|"
                      r"collective-permute)\(", line)
        if m and "-start" not in line.split("=")[1][:60]:
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts
