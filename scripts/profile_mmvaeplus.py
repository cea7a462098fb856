"""On-chip phase profile of the flagship MMVAE+ resnet step.

VERDICT r3 #3: attribute the 532 ms / 18.7% MFU step. Strategy: time
and cost-analyse (FLOPs + HBM bytes) each phase in isolation —
encoders, the M-recon decode, the full loss forward, the full training
step — plus a trivial-copy bandwidth probe to calibrate the roofline
(measured in-graph phases sustain ~500 GB/s of the 819 GB/s v5e spec;
the once-quoted "~140 GB/s streaming" was a host-loop artifact).
Achieved GB/s ~= probe GB/s on a phase means that phase is at the
chip's effective bandwidth roofline and its MFU ceiling is structural,
not an implementation gap. The probe varies its scalar operand per
rep: the axon plugin elides repeat executions of an identical
(fn, args) pair (a same-args probe once reported 80 TB/s), so prefer
the per-phase achieved GB/s when the two disagree.

Reference protocol being profiled:
``/root/reference/examples/case_studies/mmvaePlus_on_partial_data/train.py``.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from multivae_tpu.data.batch import batch_from_arrays
from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig
from multivae_tpu.models.base.step import StepInfo
from multivae_tpu.nn.mmnist import DecoderResnetMMNIST, EncoderResnetMMNIST
from multivae_tpu.ops.microbatch import microbatched_value_and_grad
from multivae_tpu.trainers.base.base_trainer import _to_bf16

M, X, B, K = 5, (3, 28, 28), 256, 10
MODS = [f"m{i}" for i in range(M)]


def build():
    config = MMVAEPlusConfig(
        n_modalities=M, K=K, latent_dim=32, modalities_specific_dim=32,
        input_dims={m: X for m in MODS},
        decoders_dist={m: "laplace" for m in MODS},
        decoder_dist_params={m: {"scale": 0.75} for m in MODS},
        prior_and_posterior_dist="laplace_with_softmax",
        beta=2.5, learn_shared_prior=False, learn_modality_prior=True,
        loss="iwae_looser", use_remat=False,
    )
    enc = {m: EncoderResnetMMNIST(private_latent_dim=32,
                                  shared_latent_dim=32) for m in MODS}
    dec = {m: DecoderResnetMMNIST(latent_dim=64) for m in MODS}
    model = MMVAEPlus(config, encoders=enc, decoders=dec, seed=0)
    rng = np.random.default_rng(0)
    batch = batch_from_arrays(data={
        m: rng.random((B, *X), dtype=np.float32) for m in MODS})
    return model, batch


def timed(fn, *args, reps=4, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops, byts = 0.0, 0.0
    row = {
        "phase": label, "ms": dt * 1e3,
        "tflops": flops / 1e12,
        "gb": byts / 1e9,
        "achieved_tflops_s": flops / dt / 1e12,
        "achieved_gb_s": byts / dt / 1e9,
    }
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in row.items()}))
    return row


def main():
    dev = jax.devices()[0]
    print(f"backend={dev.platform} device={dev}")

    # --- bandwidth probe: trivial elementwise pass over 1 GB bf16.
    # Distinct scalar operand per rep — identical (fn, args) repeats
    # appear elided through the axon plugin (see module docstring).
    big = jnp.zeros((512 * 1024 * 1024,), jnp.bfloat16)  # 1 GiB

    @jax.jit
    def copy_add(x, c):
        return x + c

    reps = 8
    out = copy_add(big, jnp.bfloat16(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = copy_add(big, jnp.bfloat16(1 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    nbytes = 2 * big.size * 2  # read + write, bf16
    print(json.dumps({"phase": "probe_copy_1gib_bf16",
                      "ms": round(dt * 1e3, 3),
                      "achieved_gb_s": round(nbytes / dt / 1e9, 1)}))
    del big, out

    model, batch = build()
    info = StepInfo.create(epoch=1)
    p16 = _to_bf16(model.params)
    b16 = _to_bf16(batch)
    rng = jax.random.key(0)

    # --- encoders forward: all M modality encodes (B rows each)
    @jax.jit
    def enc_fwd(p, b):
        outs = []
        for m in MODS:
            o = model.encoders[m].apply({"params": p["encoders"][m]},
                                        b.data[m])
            outs.append((o["embedding"], o["log_covariance"],
                         o["style_embedding"], o["style_log_covariance"]))
        return outs

    timed(enc_fwd, p16, b16, label="encode_fwd_MxB")

    # --- decode forward: M recon modalities x (M*K*B) rows, the K-sample
    # stacked layout the model uses.
    z = jnp.zeros((M, K, B, 64), jnp.bfloat16)

    @jax.jit
    def dec_fwd(p, z):
        return [model.decoders[m].apply({"params": p["decoders"][m]},
                                        z)["reconstruction"]
                for m in MODS]

    timed(dec_fwd, p16, z, label="decode_fwd_Mx(MKB)")

    # --- decode fwd+bwd (grad wrt params, sum-of-abs loss as a stand-in
    # for the laplace recon term's data movement)
    def dec_loss(p, z):
        tot = jnp.float32(0)
        for m in MODS:
            r = model.decoders[m].apply({"params": p["decoders"][m]},
                                        z)["reconstruction"]
            tot += jnp.sum(jnp.abs(r), dtype=jnp.float32)
        return tot

    dec_grad = jax.jit(jax.grad(dec_loss))
    timed(dec_grad, p16, z, label="decode_grad_Mx(MKB)")

    # --- full loss forward (one microbatch chunk of B/2, as trained)
    def loss_sum_fn(p, b, r):
        out = model.loss_function(_to_bf16(p), _to_bf16(b), r, info)
        return out["loss"].astype(jnp.float32)

    loss_fwd = jax.jit(loss_sum_fn)
    timed(loss_fwd, model.params, batch, rng, label="loss_fwd_fullB")

    # --- full training step (the bench configuration)
    opt = optax.adam(1e-3)
    opt_state = opt.init(model.params)
    mvg = microbatched_value_and_grad(loss_sum_fn, 2)

    @jax.jit
    def step(params, opt_state, batch, r):
        loss, grads = mvg(params, batch, r)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    timed(step, model.params, opt_state, batch, rng,
          label="train_step_microbatch2")

    # --- microbatched fwd+bwd without the optimizer (isolates adam+cast
    # cost; full-B value_and_grad would OOM — that is why microbatch
    # exists)
    vg = jax.jit(mvg)
    timed(vg, model.params, batch, rng, label="loss_grad_micro2_no_opt")


if __name__ == "__main__":
    main()
