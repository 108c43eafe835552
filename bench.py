"""Headline benchmark: ViT-L 3D MAE pretraining throughput on one TPU chip.

Config mirrors the reference pretrain script (SURVEY §6 / BASELINE.md):
ViT-L/16 3D MAE, 60x256x256 grayscale volumes, t_patch 3, mask ratio 0.90,
full train step (fwd + bwd + AdamW update), bf16 activations / fp32 params,
Pallas flash attention.

Two decoder geometries are measured per run (see geometry_note in the
output): the TPU-native preset (decoder_num_heads=4, head_dim 128 —
the headline `value`) and the reference-parity decoder (16 heads,
head_dim 32 — `parity_*` fields).  Same FLOPs, params count, width,
and depth either way; only the attention head partitioning differs.

Prints ONE JSON line:
  {"metric": "...", "value": vol/s/chip, "unit": "volumes/sec/chip",
   "vs_baseline": value / A100_EST, ...extras}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the bar
is an analytic A100 estimate: same train-step FLOPs at 35% MFU of A100
fp16 peak (312 TFLOPs) — a deliberately strong stand-in for the
flash-attn fp16 DDP reference.  >1.0 means exceeding that estimate.

Timing note: jax.block_until_ready does not sync through the axon relay
(see .claude/skills/verify/SKILL.md), so steps are chained on device with
lax.fori_loop and a single host read closes the timing window.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: survives backend restarts / chip recoveries
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
BATCH_SET = "BENCH_BATCH" in os.environ
# Throughput-optimal batch differs by decoder geometry (measured,
# NOTES_ROUND4.md): parity hd-32 peaks at batch 4 (batch 8 slightly
# worse); the TPU-native hd-128 decoder peaks at batch 8 (30.34 vol/s /
# 48.0% MFU vs 29.46 / 46.7% at batch 4).  Default run: each geometry
# at its own optimum; BENCH_BATCH pins both.
NATIVE_BATCH = BATCH if BATCH_SET else 8
PARITY_BATCH = BATCH if BATCH_SET else 4
# KNOWN-FAULTING: BENCH_BATCH=6 deterministically crashes the TPU worker
# on this toolchain (shape-specific backend miscompile in the full-step
# program; kernels/fwd/bwd/noopt all pass in isolation — see
# NOTES_ROUND3.md "Batch-6 crash").  Batches 4/5/7/8 verified good;
# 4 is the throughput optimum.
if BATCH == 6 and os.environ.get("BENCH_ALLOW_BATCH6") != "1":
    import sys

    print("REFUSING: batch 6 deterministically hard-faults the TPU worker "
          "on this toolchain (NOTES_ROUND3.md bisection); use 4/5/7/8, or "
          "set BENCH_ALLOW_BATCH6=1 for deliberate repro work", flush=True)
    sys.exit(2)
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
# BENCH_DEC_HEADS: decoder head count.  16 = reference parity geometry
# (Pre-training/models_mae_joint_res_flash_attn.py:807-843 ->
# decoder_embed_dim 512 / 16 heads = head_dim 32).  4 = the TPU-native
# redesign (head_dim 128 fills all MXU contraction lanes on the decoder
# attention that is 44% of step FLOPs).  The MAE decoder is a pretraining
# scaffold discarded after pretraining, so new runs do not owe the
# reference its geometry; FLOPs are identical either way (same dims).
# Default (unset): measure BOTH — TPU-native (vitl_mae_tpu_native
# preset) as the headline, parity riding along as parity_* fields.
DEC_HEADS_ENV = os.environ.get("BENCH_DEC_HEADS")
# BENCH_ENC_HEADS: encoder head partitioning (16 = reference parity,
# head_dim 64).  In the 3D step the encoder only sees 513 visible
# tokens (~4% of attention FLOPs), so this is an ablation knob, not a
# headline lever — the encoder repartition matters on the serving path
# (N=4097) and the joint 2D branch (N~13k), measured by
# scripts/bench_infer.py IB_NUM_HEADS / scripts/bench_joint.py
# BJ_ENC_HEADS.
ENC_HEADS = int(os.environ.get("BENCH_ENC_HEADS", "16"))
# BENCH_MESH=1: shard the batch over ALL local devices (batch scales with
# device count; vol/s reported per chip). Off by default to keep the
# proven single-chip graph/compile-cache.
USE_MESH = os.environ.get("BENCH_MESH", "0") == "1"
FRAMES, IMG, PATCH, TPATCH = 60, 256, 16, 3
MASK_RATIO = 0.90
STEPS = 8
V5E_PEAK_BF16 = 197e12
A100_PEAK_FP16 = 312e12
A100_ASSUMED_MFU = 0.35   # legacy flat comparator (kept for reference)

# Component-wise A100 comparator (round-3 re-derivation; the round-2 flat
# 35%-MFU model ignored that 44% of the step FLOPs are head_dim-32
# decoder attention, which no CUDA kernel runs at 35% of peak either):
# - Attention: flash-attn-2 at head_dim 32, seq ~5k.  Unlike the TPU MXU
#   (128-deep contraction -> hd-32 uses 32/128 lanes BY CONSTRUCTION),
#   A100 tensor-core MMA granularity is k=8/16, so hd=32 is not
#   contraction-starved — but FA2's practical hd-32 rates are bound by
#   softmax/smem/occupancy: public FA2 A100 benches run ~120-170 TF at
#   hd=128 and roughly halve at hd<=64; hd=32 fwd ~70 TF (22% peak),
#   bwd ~55 TF (18%) are generous estimates.
# - Dense (qkvo/mlp/embeds at batch-1 shapes, [513..5121, 1024] GEMMs):
#   50% of fp16 peak — strong for cuBLAS + AMP overhead at these sizes.
# DDP all-reduce, fp16 loss-scaler and host dataloading are ignored
# (generous to the A100).  Result ~29 vol/s vs the flat model's 35.
A100_ATTN_FWD_TF = 70e12
A100_ATTN_BWD_TF = 55e12
A100_DENSE_EFF = 0.50


def mae_train_flops(d: int = 1024, layers: int = 24, dd: int = 512,
                    dlayers: int = 8, frames: int = FRAMES, img: int = IMG,
                    patch: int = PATCH, tpatch: int = TPATCH,
                    mask: float = MASK_RATIO, split: bool = False):
    """Analytic FLOPs (fwd+bwd ~= 3x fwd) of one 3D MAE train step, per
    volume, for any encoder/decoder dims (ViT-L default; bench_joint /
    bench_vith pass ViT-H dims).

    split=True returns (dense_fwd, attn_fwd) fwd-only components for the
    A100 component model (train totals are 3x each)."""
    l_full = (frames // tpatch) * (img // patch) ** 2     # 5120 @ ViT-L
    l_vis = int(l_full * (1 - mask)) + 1                  # 513 (cls)
    l_dec = l_full + 1

    def lin_flops(n, dim):
        return 2 * n * 12 * dim * dim         # qkvo + mlp matmuls

    def attn_flops(n, dim):
        return 2 * 2 * n * n * dim            # qk^T and pv

    dense = (layers * lin_flops(l_vis, d) + dlayers * lin_flops(l_dec, dd)
             + 2 * l_full * (tpatch * patch * patch) * d   # patch embed
             + 2 * l_dec * dd * (tpatch * patch * patch)   # decoder_pred
             + 2 * l_dec * d * dd)                         # decoder_embed
    attn = layers * attn_flops(l_vis, d) + dlayers * attn_flops(l_dec, dd)
    if split:
        return dense, attn
    return 3.0 * (dense + attn)


def mae2d_train_flops(d: int = 1024, layers: int = 24, dd: int = 512,
                      dlayers: int = 8, img2d: int = 512,
                      patch: int = PATCH, tpatch: int = TPATCH,
                      mask2d: float = 0.80) -> float:
    """Analytic train FLOPs of the high-res 2D co-training branch, per
    image (t'=1 through the shared joint decoder)."""
    n_full = (img2d // patch) ** 2
    n_vis = int(n_full * (1 - mask2d)) + 1
    n_dec = n_full + 1
    dense = (layers * 2 * n_vis * 12 * d * d
             + dlayers * 2 * n_dec * 12 * dd * dd
             + 2 * n_full * (tpatch * patch ** 2) * d
             + 2 * n_dec * d * dd
             + 2 * n_dec * dd * (tpatch * patch ** 2))
    attn = (layers * 2 * 2 * n_vis * n_vis * d
            + dlayers * 2 * 2 * n_dec * n_dec * dd)
    return 3.0 * (dense + attn)


def train_step_flops_per_volume(split: bool = False):
    """ViT-L headline-config FLOPs (the bench.py measurement)."""
    return mae_train_flops(split=split)


def a100_component_est_vols_per_sec() -> float:
    """A100 vol/s from the component model above: attention fwd at its
    FA2 hd-32 rate, attention bwd (2x fwd FLOPs) at the bwd rate, dense
    (3x fwd FLOPs) at A100_DENSE_EFF of fp16 peak."""
    dense_fwd, attn_fwd = train_step_flops_per_volume(split=True)
    t = (attn_fwd / A100_ATTN_FWD_TF
         + 2.0 * attn_fwd / A100_ATTN_BWD_TF
         + 3.0 * dense_fwd / (A100_DENSE_EFF * A100_PEAK_FP16))
    return 1.0 / t


# Fairness comparator (round-4 NOTES, promoted into the JSON per the
# round-4 verdict): an A100 running the SAME hd-128 decoder repartition
# would also speed up.  Same component model with generous public FA2
# hd-128 A100 rates (~165 TF fwd / ~130 TF bwd) -> ~47.6 vol/s.  The
# headline vs_baseline comparator stays the reference's own published
# configuration (hd-32), which is the workload BASELINE.md defines;
# this number contextualizes it.
A100_ATTN_FWD_TF_HD128 = 165e12
A100_ATTN_BWD_TF_HD128 = 130e12


def a100_native_est_vols_per_sec() -> float:
    """A100 vol/s if it ALSO ran the TPU-native hd-128 decoder geometry
    (identical FLOPs; only the FA2 attention rates change)."""
    dense_fwd, attn_fwd = train_step_flops_per_volume(split=True)
    t = (attn_fwd / A100_ATTN_FWD_TF_HD128
         + 2.0 * attn_fwd / A100_ATTN_BWD_TF_HD128
         + 3.0 * dense_fwd / (A100_DENSE_EFF * A100_PEAK_FP16))
    return 1.0 / t


def measure(dec_heads: int, batch: int | None = None):
    """One full-train-step measurement at the given decoder head count
    and batch size (default: the BENCH_BATCH env / 4).
    Returns (vol/s, step_ms, mfu)."""
    if batch is None:
        batch = BATCH
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train import optim, schedules
    from octcubem_tpu.train.train_state import TrainState
    from octcubem_tpu.train.mae_engine import make_mae_train_step

    # BENCH_REMAT_NORM=1: recompute fp32 LayerNorms in the backward
    # instead of saving their outputs (HBM-residual-traffic experiment)
    model = mae3d.flash_attn_mae_vit_large_patch16(
        num_frames=FRAMES, t_patch_size=TPATCH, pred_t_dim=FRAMES,
        input_size=IMG, high_res_input_size=512, in_chans=1,
        dtype=jnp.bfloat16, attn_impl="auto", remat=REMAT,
        remat_norm=os.environ.get("BENCH_REMAT_NORM", "0") == "1",
        num_heads=ENC_HEADS, decoder_num_heads=dec_heads,
    )
    x = jax.random.normal(jax.random.key(0), (batch, FRAMES, IMG, IMG, 1),
                          jnp.float32)
    params = jax.jit(
        lambda k, x: model.init({"params": k, "masking": k}, x,
                                mask_ratio=MASK_RATIO)
    )(jax.random.key(1), x)
    sched = schedules.warmup_half_cosine(1.6e-3, 0.0, 1, 50, 1000)
    # BENCH_MU=bf16 stores the Adam first moment in bf16 (halves mu HBM
    # traffic in the update step); default fp32 = reference semantics
    mu = jnp.bfloat16 if os.environ.get("BENCH_MU") == "bf16" else None
    # BENCH_OPT=chain: force the legacy optax.chain pipeline (the default
    # build_adamw now delegates to the single-pass fused AdamW, measured
    # ~0.5ms faster — NOTES_ROUND3.md attempt 5)
    tx = optim.build_adamw(params, sched, weight_decay=0.05, mu_dtype=mu,
                           force_chain=os.environ.get("BENCH_OPT") == "chain")
    state = TrainState.create(params, tx, jax.random.key(2))

    # BENCH_GNORM=0: drop the per-step global-grad-norm metric (an extra
    # full grad read unless XLA fuses it) — perf experiment knob.
    # BENCH_DONATE=0: disable state donation (batch-6 crash isolation).
    step = make_mae_train_step(
        model, tx, joint=False,
        compute_grad_norm=os.environ.get("BENCH_GNORM", "1") != "0",
        donate=os.environ.get("BENCH_DONATE", "1") != "0")

    if USE_MESH:
        from octcubem_tpu.core import mesh as meshlib
        from octcubem_tpu.train.mae_engine import shard_batch, replicate_state

        mesh = meshlib.make_mesh()
        n_dev = mesh.shape[meshlib.DATA_AXIS]
        x = jax.random.normal(jax.random.key(0),
                              (batch * n_dev, FRAMES, IMG, IMG, 1),
                              jnp.float32)
        x = shard_batch(x, mesh)
        state = replicate_state(state, mesh)

    @functools.partial(
        jax.jit,
        donate_argnums=(0,) if os.environ.get("BENCH_DONATE", "1") != "0"
        else ())
    def run_steps(state, x):
        def body(i, st):
            st, _ = step(st, x, mask_ratio=MASK_RATIO)
            return st
        return jax.lax.fori_loop(0, STEPS, body, state)

    # warmup / compile
    state = run_steps(state, x)
    _ = float(jax.tree.leaves(state.params)[0].sum())  # force sync

    t0 = time.time()
    state = run_steps(state, x)
    _ = float(jax.tree.leaves(state.params)[0].sum())
    dt = time.time() - t0
    del state, x  # free HBM before a possible second geometry

    step_time = dt / STEPS
    vols_per_sec = batch / step_time
    flops_per_vol = train_step_flops_per_volume()
    mfu = flops_per_vol * vols_per_sec / V5E_PEAK_BF16
    return vols_per_sec, step_time * 1000, mfu


def refresh_extras():
    """BENCH_FULL=1: re-measure the extras by running the dedicated
    scripts as subprocesses (each writes its key into
    docs/perf/recorded.json via octcubem_tpu.utils.recorded).  The chip
    serializes work, so this adds their full runtime (~10-15 min warm
    cache) to the bench."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    runs = [
        # joint production step, TPU-native geometry (joint_enc16_dec4)
        ({"BJ_DEC_HEADS": "4", "BJ_ACCUM2D": "4", "BJ_PREMASK": "1"},
         "scripts/bench_joint.py"),
        # serving ladder endpoints (serving_enc16 / serving_enc8)
        ({}, "scripts/bench_infer.py"),
        ({"IB_NUM_HEADS": "8"}, "scripts/bench_infer.py"),
    ]
    for env_extra, script in runs:
        env = dict(os.environ, **env_extra)
        # The axon TPU worker occasionally throws a transient
        # FAILED_PRECONDITION right after a previous process released
        # the chip (it self-recovers in ~5-10 min, NOTES_ROUND3/5).  A
        # failed extras refresh must not kill the headline bench: retry
        # once after a cooldown, then fall back to the existing ledger
        # row (its recorded_at shows the staleness).
        for attempt in (1, 2):
            print(f"# BENCH_FULL: {env_extra} {script} (attempt {attempt})",
                  file=sys.stderr, flush=True)
            res = subprocess.run(
                [sys.executable, os.path.join(here, script)],
                env=env, stdout=sys.stderr)
            if res.returncode == 0:
                break
            if attempt == 1:
                print(f"# BENCH_FULL: {script} rc={res.returncode}; "
                      "cooling down 300s before retry",
                      file=sys.stderr, flush=True)
                time.sleep(300)
            else:
                print(f"# BENCH_FULL: {script} failed twice "
                      f"(rc={res.returncode}); keeping the prior ledger "
                      "row for its key", file=sys.stderr, flush=True)


def main():
    # retry-path self-test hook (see _main_with_retry): inject one
    # first-process failure without touching the measurement code
    if (os.environ.get("BENCH_SELFTEST_FAIL") == "1"
            and os.environ.get("BENCH_RETRY") != "1"):
        raise RuntimeError("BENCH_SELFTEST_FAIL injected failure")
    flops_per_vol = train_step_flops_per_volume()
    a100_flat = A100_PEAK_FP16 * A100_ASSUMED_MFU / flops_per_vol
    a100_est = a100_component_est_vols_per_sec()
    if os.environ.get("BENCH_FULL") == "1":
        refresh_extras()

    if DEC_HEADS_ENV is not None:
        # explicit geometry: single measurement, that geometry headline
        dec = int(DEC_HEADS_ENV)
        batch_used = BATCH
        vol_s, step_ms, mfu = measure(dec)
        parity = (vol_s, step_ms, mfu) if dec == 16 else None
        parity_batch = BATCH
    else:
        # default: the framework's TPU-native headline config (the
        # vitl_mae_tpu_native preset, decoder head_dim 128) as `value`,
        # reference-parity geometry (head_dim 32) riding along — both
        # measured fresh in this run, each at its optimal batch
        dec = 4
        batch_used = NATIVE_BATCH
        vol_s, step_ms, mfu = measure(4, NATIVE_BATCH)
        parity = measure(16, PARITY_BATCH)
        parity_batch = PARITY_BATCH

    out = {
        "metric": "MAE ViT-L 3D pretrain throughput (60x256x256, mask 0.9)",
        "value": round(vol_s, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vol_s / a100_est, 3),
        "step_time_ms": round(step_ms, 1),
        "batch": batch_used,
        "decoder_num_heads": dec,
        "encoder_num_heads": ENC_HEADS,
        "remat": REMAT,
        "mfu": round(mfu, 4),
        "flops_per_volume_T": round(flops_per_vol / 1e12, 3),
        "a100_est_vol_s": round(a100_est, 2),
        "vs_a100_flat35": round(vol_s / a100_flat, 3),
        "baseline_note": "A100 est = component model: 44% of step FLOPs "
                         "are hd-32 decoder attention (FA2 hd-32 A100 "
                         "rates ~70 TF fwd / ~55 TF bwd, generous), dense "
                         "at 50% of 312 TF fp16; DDP/loader overhead "
                         "ignored -> ~29 vol/s.  Flat-35%-MFU alternate "
                         "(35 vol/s) reported as vs_a100_flat35; "
                         "derivation in NOTES_ROUND3.md",
        # the decoder-geometry story (NOTES_ROUND4.md): at the reference
        # parity geometry (16 heads -> head_dim 32) the decoder attention
        # is MXU output-rate bound at 32/128 contraction lanes — measured
        # ceiling ~28% MFU at batch 4 (NOTES_ROUND2.md).  The TPU-native
        # preset re-partitions the same-width decoder into 4 heads
        # (head_dim 128, identical FLOPs/param count): measured 46.7%
        # MFU.  The decoder is a pretraining scaffold discarded after
        # pretraining; loss trajectories match (scripts/bench_dec_quality).
        "geometry_note": (
            "headline = vitl_mae_tpu_native preset (decoder_num_heads=4, "
            "head_dim 128); parity_* = reference decoder geometry (16 "
            "heads, head_dim 32, MXU output-rate bound ~28% ceiling)"
            if DEC_HEADS_ENV is None else
            f"headline measured at the BENCH_DEC_HEADS={dec} geometry "
            "(explicitly pinned; no second geometry run)"),
    }
    if parity is not None:
        out.update({
            "parity_vol_s": round(parity[0], 3),
            "parity_step_ms": round(parity[1], 1),
            "parity_mfu": round(parity[2], 4),
            "parity_vs_baseline": round(parity[0] / a100_est, 3),
            "parity_batch": parity_batch,
        })
    if ENC_HEADS == 8 and dec == 4:
        # the enc8+dec4 headline is itself a ledger row other bench runs
        # surface as native_enc8_* (vitl_mae_tpu_native_enc8 preset)
        from octcubem_tpu.utils.recorded import record

        record(f"native_enc8_b{batch_used}",
               {"vol_s": round(vol_s, 3), "mfu": round(mfu, 4),
                "step_time_ms": round(step_ms, 1), "batch": batch_used,
                "source": "BENCH_ENC_HEADS=8 bench.py"})
    # fairness comparator beside the claim (round-4 verdict weak #2):
    # vs_baseline compares against the reference's published hd-32
    # config; a100_native_est_vol_s is what the same component model
    # gives an A100 running OUR hd-128 repartition.
    a100_native = a100_native_est_vols_per_sec()
    out.update({
        "a100_native_est_vol_s": round(a100_native, 2),
        "vs_a100_native_est": round(vol_s / a100_native, 3),
        "comparator_note": "vs_baseline = vs the reference's published "
                           "hd-32 decoder config (the workload "
                           "BASELINE.md defines); vs_a100_native_est = "
                           "vs an A100 running the same hd-128 "
                           "repartition (FA2 hd-128 ~165/130 TF, same "
                           "component model)",
    })
    # the rest of the measured story — joint production step, serving
    # ladder, retrieval encode, ViT-H — comes from the LIVE ledger
    # docs/perf/recorded.json, which every dedicated bench script
    # overwrites (with a timestamp) on each run; BENCH_FULL=1 re-runs
    # the joint + serving scripts in this invocation first.
    # `value`/`parity_*` above are always measured fresh here.
    from octcubem_tpu.utils.recorded import load as load_recorded

    rec = load_recorded()

    def _ext(prefix, key, fields=("step_time_ms", "mfu", "vol_s",
                                  "pairs_s", "recorded_at")):
        row = rec.get(key)
        if not row:
            return {}
        return {f"{prefix}_{f}": row[f] for f in fields if f in row}

    out.update(_ext("joint", "joint_enc16_dec16"))
    out.update(_ext("joint_native", "joint_enc16_dec4"))
    out.update(_ext("joint_enc8", "joint_enc8_dec4"))
    out.update(_ext("serving", "serving_enc16"))
    # encoder ALSO re-partitioned (vitl_mae_tpu_native_enc8 preset,
    # num_heads=8 -> head_dim 128): only for encoders pretrained at
    # that geometry — learning-neutral on the memorization ablation
    # (docs/perf/enc_quality_mem600.jsonl)
    out.update(_ext("serving_enc8", "serving_enc8"))
    out.update(_ext("serving_enc8_int8", "serving_enc8_int8"))
    out.update(_ext("native_enc8", "native_enc8_b8"))
    out.update(_ext("retclip_encode", "retclip_encode"))
    out.update(_ext("vith", "vith_enc10_dec4"))
    out.update(_ext("vith_joint", "vith_joint_enc10_dec4",
                    fields=("step_time_ms", "mfu", "vol3d_per_sec",
                            "img2d_per_sec", "recorded_at")))
    # real-PNG-ingest composition check (round-4 verdict item 6): frac of
    # the step spent waiting on the loader when fed by real ingest
    out.update(_ext("ingest", "ingest_epoch",
                    fields=("data_wait_frac", "recorded_at")))
    out["extras_note"] = (
        "joint_*/serving_*/native_enc8_*/retclip_encode_*/vith_*/ingest_* come "
        "from docs/perf/recorded.json — re-measured whenever the "
        "dedicated scripts run (each *_recorded_at dates its own "
        "measurement); BENCH_FULL=1 refreshes joint+serving in this "
        "invocation")
    print(json.dumps(out))


def _main_with_retry():
    """The axon TPU worker occasionally throws a transient
    FAILED_PRECONDITION (it self-recovers in ~5-10 min — observed twice,
    NOTES_ROUND3/NOTES_ROUND5); an in-process retry is not safe because
    the backend may be poisoned, so retry ONCE in a fresh process after
    a cooldown.  The deliberate refusals (batch-6 SystemExit) propagate
    immediately; BENCH_RETRY=1 marks the second attempt (no recursion);
    BENCH_RETRY_COOLDOWN overrides the 420 s wait (validation)."""
    try:
        main()
        return
    except SystemExit:
        raise
    except KeyboardInterrupt:
        raise
    except Exception as e:
        if os.environ.get("BENCH_RETRY") == "1":
            raise
        import subprocess
        import sys

        print(f"# bench: {type(e).__name__}: {e} — retrying once in a "
              "fresh process after cooldown (transient TPU-worker-fault "
              "recovery)", file=sys.stderr, flush=True)
        time.sleep(int(os.environ.get("BENCH_RETRY_COOLDOWN", "420")))
        raise SystemExit(subprocess.call(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, BENCH_RETRY="1")))


if __name__ == "__main__":
    _main_with_retry()
