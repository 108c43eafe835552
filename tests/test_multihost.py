"""Real multi-host validation: two OS processes form a JAX cluster over
the Gloo/distributed-runtime service (the DCN-analogue on this CPU box),
build one global (data x fsdp) mesh spanning both hosts' devices, and run
a real tiny MAE train step with each host feeding only its local batch
shard via core.multihost.global_batch.

This covers what the single-process 8-virtual-device conftest mesh cannot:
jax.distributed.initialize rendezvous (core/multihost.py — the equivalent
of the reference's env-var process-group init, OCTCube/util/misc.py:
225-257), cross-process collectives, and the per-host data-feeding
contract (DistributedSampler equivalent).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from octcubem_tpu.core import mesh as meshlib
from octcubem_tpu.core import multihost
from octcubem_tpu.models import mae3d
from octcubem_tpu.train import optim, schedules
from octcubem_tpu.train.mae_engine import make_mae_train_step
from octcubem_tpu.train.train_state import TrainState

# env-driven rendezvous (JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES /
# _PROCESS_ID set by the parent) — the CLI startup path
info = multihost.maybe_initialize()
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info
pid = info["process_index"]

mesh = meshlib.make_mesh(n_data=4, n_fsdp=2)  # spans both hosts

model = mae3d.MaskedAutoencoderViT3D(
    input_size=32, patch_size=16, in_chans=1, embed_dim=64, depth=2,
    num_heads=2, decoder_embed_dim=32, decoder_depth=1,
    decoder_num_heads=2, num_frames=6, t_patch_size=3, pred_t_dim=6,
    attn_impl="naive")

# every host computes the same init (same seed) -> replicated params
x_local = (np.arange(2 * 6 * 32 * 32, dtype=np.float32)
           .reshape(2, 6, 32, 32, 1) / 1e4 + pid)
params = model.init({"params": jax.random.key(0),
                     "masking": jax.random.key(1)},
                    jnp.zeros((1, 6, 32, 32, 1)), mask_ratio=0.75)
tx = optim.build_adamw(params, schedules.warmup_half_cosine(
    1e-3, 0.0, 1, 10, 100), weight_decay=0.05)
state = TrainState.create(params, tx, jax.random.key(2))

with mesh:
    # device_put rejects non-addressable shardings in multi-process runs;
    # put_tree is the multi-host placement path
    state = multihost.put_tree(mesh, state, meshlib.fsdp_param_spec)
    # each host contributes 2 of the 4 global volumes
    batch = multihost.global_batch(mesh, x_local)
    assert batch.shape[0] == 4, batch.shape
    step = make_mae_train_step(model, tx)
    state, metrics = step(state, batch, mask_ratio=0.75)
    loss = float(metrics["loss"])

assert np.isfinite(loss), loss
print(f"MHLOSS {loss:.8f} pid={pid}", flush=True)

# per-sample host reads must use local_rows: frame_losses spans the
# global batch (np.asarray would raise on non-addressable devices);
# each host gets exactly ITS 2 rows back (the SPL hardness contract)
fl = multihost.local_rows(metrics["frame_losses"])
assert fl.shape[0] == 2, fl.shape
assert np.isfinite(fl).all()
print(f"MHROWS {fl.sum():.8f} pid={pid}", flush=True)

# accum-microbatch feeding contract: each host contributes its micro
# shard along dim 1 ([accum, micro_local, ...] -> global [accum, 4, ...]
# with dim 1 sharded over 'data'), the micro_axis=True path of
# multihost.global_batch / mae_engine.shard_microbatch
xm_local = (np.arange(2 * 2 * 6 * 32 * 32, dtype=np.float32)
            .reshape(2, 2, 6, 32, 32, 1) / 2e4 + pid)
with mesh:
    batch_m = multihost.global_batch(mesh, xm_local, micro_axis=True)
    assert batch_m.shape[:2] == (2, 4), batch_m.shape
    step_m = make_mae_train_step(model, tx, accum_iter=2)
    state, metrics_m = step_m(state, batch_m, mask_ratio=0.75)
    loss_m = float(metrics_m["loss"])
assert np.isfinite(loss_m), loss_m
print(f"MHLOSS2 {loss_m:.8f} pid={pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(script, port):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # child provisions its own 4 devices
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return [(p.returncode, o) for p, o in zip(procs, outs)]


def test_two_process_cluster_mae_step(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    # _free_port has an inherent bind-then-release race; retry once with
    # a fresh port if the rendezvous itself failed
    for attempt in range(2):
        results = _run_cluster(script, _free_port())
        if all(rc == 0 for rc, _ in results) or attempt == 1:
            break
    for pid, (rc, out) in enumerate(results):
        assert rc == 0, f"process {pid} failed:\n{out[-3000:]}"
    for tag in ("MHLOSS", "MHLOSS2"):
        losses = [re.search(tag + r" ([0-9.eE+-]+)", o) for _, o in results]
        assert all(losses), [o[-500:] for _, o in results]
        l0, l1 = (float(m.group(1)) for m in losses)
        # both hosts see the identical global loss (same compiled program,
        # same global batch) — the cross-host collective actually ran
        assert l0 == l1, (tag, l0, l1)
    # local_rows returns DIFFERENT rows per host (each host fed distinct
    # volumes: +pid offset), unlike the replicated losses above
    rows = [re.search(r"MHROWS ([0-9.eE+-]+)", o) for _, o in results]
    assert all(rows), [o[-500:] for _, o in results]
    r0, r1 = (float(m.group(1)) for m in rows)
    assert r0 != r1, (r0, r1)
