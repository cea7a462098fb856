"""Multi-epoch ELBO-curve parity: N epochs of our jitted BaseTrainer vs a
faithful torch-CPU replica of the reference training loop
(``src/multivae/trainers/base/base_trainer.py:642-700``) with IDENTICAL
initial weights, batch order, Gaussian noise, Adam hyperparameters and
epoch-wise scheduler.

This is the BASELINE north star ("ELBO curves matching within noise").
Noise matching: the trainer derives the step rng as
``fold_in(key(seed), global_step)`` and MVTCAE/MoPoE pass it to
``rsample_from_gaussian`` -> ``jax.random.normal(rng, mu.shape)``; the torch
replica draws the SAME eps values by replaying that key chain with
jax.random on the host, so the two curves differ only by float noise.
The batch order replays the loader's per-epoch permutation
``np.random.default_rng((seed, epoch)).permutation(n)`` including the
wrap-around padding with zero weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import (
    MMVAE,
    MVTCAE,
    MMVAEConfig,
    MVTCAEConfig,
    MoPoE,
    MoPoEConfig,
)
from multivae_tpu.nn import BaseAEConfig, Decoder_AE_MLP, Encoder_VAE_MLP
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
from multivae_tpu.trainers.base.callbacks import TrainingCallback

SEED = 42
LR = 1e-3
SCHED = {"step_size": 3, "gamma": 0.5}


class _LossRecorder(TrainingCallback):
    def __init__(self):
        self.train_losses = []

    def on_log(self, training_config, logs, **kwargs):
        self.train_losses.append(logs["train_epoch_loss"])


def _make_data(n, dims, seed=5):
    rng = np.random.default_rng(seed)
    return {m: rng.uniform(size=(n, *d)).astype(np.float32)
            for m, d in dims.items()}


def _make_nets(dims, latent, hid):
    encoders = {m: Encoder_VAE_MLP(
        BaseAEConfig(input_dim=d, latent_dim=latent), hidden_dim=hid)
        for m, d in dims.items()}
    decoders = {m: Decoder_AE_MLP(
        BaseAEConfig(input_dim=d, latent_dim=latent), hidden_dim=hid)
        for m, d in dims.items()}
    return encoders, decoders


def _train_ours(model, data, n_epochs, batch_size, tmp_path,
                scheduler=("StepLR", None), **extra_cfg):
    ds = MultimodalBaseDataset(data)
    rec = _LossRecorder()
    sched_cls, sched_params = scheduler
    trainer = BaseTrainer(
        model, ds,
        training_config=BaseTrainerConfig(
            output_dir=str(tmp_path), num_epochs=n_epochs,
            learning_rate=LR, per_device_train_batch_size=batch_size,
            per_device_eval_batch_size=batch_size, seed=SEED,
            optimizer_cls="Adam", scheduler_cls=sched_cls,
            scheduler_params=dict(sched_params if sched_params is not None
                                  else SCHED),
            n_devices=1, **extra_cfg,
        ),
        callbacks=[rec],
    )
    trainer.train()
    return np.asarray(rec.train_losses), trainer


def _torch_mlp_modules(params, dims, latent):
    """Torch Linear replicas of Encoder_VAE_MLP / Decoder_AE_MLP with the
    flax weights copied in (the reference's default architectures,
    ``models/nn/default_architectures.py:21,225``)."""
    import torch
    import torch.nn as tnn

    def cp(lin, tree, name):
        lin.weight.data = torch.tensor(np.asarray(tree[name]["kernel"]).T)
        lin.bias.data = torch.tensor(np.asarray(tree[name]["bias"]))

    modules, t_params = {}, []
    for m, d in dims.items():
        in_dim = int(np.prod(d))
        hid = params["encoders"][m]["Dense_0"]["kernel"].shape[1]
        enc = tnn.ModuleDict({
            "l0": tnn.Linear(in_dim, hid), "l1": tnn.Linear(hid, hid),
            "mu": tnn.Linear(hid, latent), "lv": tnn.Linear(hid, latent),
        })
        dec = tnn.ModuleDict({
            "l0": tnn.Linear(latent, hid), "l1": tnn.Linear(hid, in_dim),
        })
        pe, pd = params["encoders"][m], params["decoders"][m]
        cp(enc["l0"], pe, "Dense_0")
        cp(enc["l1"], pe, "Dense_1")
        cp(enc["mu"], pe, "Dense_2")
        cp(enc["lv"], pe, "Dense_3")
        cp(dec["l0"], pd, "Dense_0")
        cp(dec["l1"], pd, "Dense_1")
        modules[m] = (enc, dec)
        t_params.extend(list(enc.parameters()) + list(dec.parameters()))
    return modules, t_params


def _epoch_batches(n, batch_size, epoch):
    """Replay the loader's permutation + wrap-around padding semantics
    (``data/loader.py:68-94``)."""
    perm = np.random.default_rng((SEED, epoch)).permutation(n)
    n_batches = int(np.ceil(n / batch_size))
    for b in range(n_batches):
        idx = perm[b * batch_size: (b + 1) * batch_size]
        pad = batch_size - len(idx)
        w = np.ones(batch_size, np.float32)
        if pad:
            idx = np.concatenate([idx, np.resize(perm, pad)])
            w[batch_size - pad:] = 0.0
        yield idx, w


def _step_eps(global_step, shape, n_keys=0, key_index=0):
    """The exact Gaussian noise our jitted train step consumes at this
    global step (fold_in + optional split chain)."""
    key = jax.random.fold_in(jax.random.key(SEED), global_step)
    if n_keys:
        key = jax.random.split(key, n_keys)[key_index]
    return np.asarray(jax.random.normal(key, shape, dtype=jnp.float32))


def _train_torch_mvtcae(params, data, dims, latent, alpha, beta, n_epochs,
                        batch_size, plateau=None):
    """Reference-style MVTCAE training loop in torch
    (``mvtcae_model.py:42-108`` inside ``base_trainer.py:642-700``).
    ``plateau`` (kwargs dict) swaps the epoch scheduler for TORCH'S OWN
    ``ReduceLROnPlateau`` stepping on the epoch train loss — the
    reference's ``_schedulers_step(epoch_train_loss)`` with no eval
    set."""
    import torch

    modules, t_params = _torch_mlp_modules(params, dims, latent)
    optim = torch.optim.Adam(t_params, lr=LR)
    if plateau is not None:
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            optim, **plateau)
    else:
        sched = torch.optim.lr_scheduler.StepLR(optim, **SCHED)
    mods = list(dims)
    M = float(len(mods))
    n = len(data[mods[0]])
    x_all = {m: torch.tensor(data[m].reshape(n, -1)) for m in mods}

    losses, global_step = [], 0
    for epoch in range(1, n_epochs + 1):
        loss_sum_total = 0.0
        for idx, w_np in _epoch_batches(n, batch_size, epoch):
            w = torch.tensor(w_np)
            n_data = max(float(w_np.sum()), 1.0)
            x = {m: x_all[m][idx] for m in mods}
            mus, lvs = [], []
            for m in mods:
                enc, _ = modules[m]
                h = torch.relu(enc["l0"](x[m]))
                h = torch.relu(enc["l1"](h))
                mus.append(enc["mu"](h))
                lvs.append(enc["lv"](h))
            t_mus, t_lvs = torch.stack(mus), torch.stack(lvs)
            T = 1.0 / (torch.exp(t_lvs) + 1e-8)
            Tt = T.sum(0)
            jmu = (t_mus * T).sum(0) / Tt
            jlv = -torch.log(Tt)
            eps = torch.tensor(_step_eps(global_step, jmu.shape))
            z = jmu + torch.exp(0.5 * jlv) * eps
            joint_kld = ((-0.5 * (1 - jlv.exp() - jmu.pow(2) + jlv).sum(-1))
                         * w).sum()
            loss_rec = 0.0
            for m in mods:
                _, dec = modules[m]
                recon = torch.sigmoid(dec["l1"](torch.relu(dec["l0"](z))))
                lp = torch.distributions.Normal(recon, 1.0).log_prob(x[m])
                loss_rec = loss_rec + ((-lp).sum(-1) * w).sum()
            klds = 0.0
            for i in range(len(mods)):
                klds = klds + ((-0.5 * (
                    1 - (jlv - t_lvs[i]).exp()
                    - (jmu - t_mus[i]).pow(2) / t_lvs[i].exp()
                    + jlv - t_lvs[i]).sum(-1)) * w).sum()
            total = ((M - alpha) / M * loss_rec
                     + beta * (alpha / M * klds + (1 - alpha) * joint_kld))
            loss = total / n_data
            optim.zero_grad()
            loss.backward()
            optim.step()
            loss_sum_total += float(total.detach())
            global_step += 1
        if plateau is not None:
            sched.step(loss_sum_total / n)
        else:
            sched.step()
        losses.append(loss_sum_total / n)
    return np.asarray(losses)


def _train_torch_mopoe(model, data, dims, latent, beta, n_epochs,
                       batch_size):
    """Reference-style MoPoE training loop in torch (``mopoe_model.py:
    147-247``: all-subset PoE, deterministic balanced component split on
    complete data, subset-weighted joint divergence)."""
    import torch

    params = model.params
    modules, t_params = _torch_mlp_modules(params, dims, latent)
    optim = torch.optim.Adam(t_params, lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(optim, **SCHED)
    mods = list(dims)
    S_mat = torch.tensor(np.asarray(model._subset_mask))         # (S, M)
    full_flag = torch.tensor(np.asarray(model._full_subset_flag))
    S = S_mat.shape[0]
    n = len(data[mods[0]])
    x_all = {m: torch.tensor(data[m].reshape(n, -1)) for m in mods}

    losses, global_step = [], 0
    for epoch in range(1, n_epochs + 1):
        loss_sum_total = 0.0
        for idx, w_np in _epoch_batches(n, batch_size, epoch):
            B = len(idx)
            w = torch.tensor(w_np)
            n_data = max(float(w_np.sum()), 1.0)
            x = {m: x_all[m][idx] for m in mods}
            mus, lvs = [], []
            for m in mods:
                enc, _ = modules[m]
                h = torch.relu(enc["l0"](x[m]))
                h = torch.relu(enc["l1"](h))
                mus.append(enc["mu"](h))
                lvs.append(enc["lv"](h))
            t_mus, t_lvs = torch.stack(mus), torch.stack(lvs)
            precision = 1.0 / (torch.exp(t_lvs) + 1e-8)
            T_sub = torch.einsum("sm,mbd->sbd", S_mat, precision)
            mu_sub = torch.einsum("sm,mbd->sbd", S_mat, t_mus * precision)
            T_sub = T_sub + (full_flag / (1.0 + 1e-8))[:, None, None]
            mus_sub = mu_sub / T_sub
            lvs_sub = -torch.log(T_sub)
            # deterministic balanced split (complete data)
            sel = np.minimum(np.arange(B) // max(B // S, 1), S - 1)
            jmu = mus_sub[sel, np.arange(B)]
            jlv = lvs_sub[sel, np.arange(B)]
            # the loss_function splits its rng in 4; z uses keys[2]
            eps = torch.tensor(_step_eps(
                global_step, jmu.shape, n_keys=4, key_index=2))
            z = jmu + torch.exp(0.5 * jlv) * eps
            klds = -0.5 * (1 - lvs_sub.exp() - mus_sub.pow(2)
                           + lvs_sub).sum(-1)                     # (S, B)
            group_div = ((klds / S).sum(0) * w).sum() / n_data
            loss = beta * group_div
            for m in mods:
                _, dec = modules[m]
                recon = torch.sigmoid(dec["l1"](torch.relu(dec["l0"](z))))
                lp = torch.distributions.Normal(recon, 1.0).log_prob(x[m])
                loss = loss + ((-lp).sum(-1) * w).sum() / n_data
            optim.zero_grad()
            loss.backward()
            optim.step()
            loss_sum_total += float(loss.detach()) * n_data
            global_step += 1
        sched.step()
        losses.append(loss_sum_total / n)
    return np.asarray(losses)


def _step_laplace_eps(global_step, n_mods, mod_index, shape):
    """The exact inverse-CDF uniforms ``MMVAE._sample_embeddings`` consumes
    at this global step for modality ``mod_index``: the trainer's
    ``fold_in(key(seed), step)`` key split ``n_mods`` ways, then
    ``dist_rsample``'s ``uniform(minval=-0.5+eps, maxval=0.5)``
    (``ops/kdist.py:91-97``)."""
    key = jax.random.fold_in(jax.random.key(SEED), global_step)
    key = jax.random.split(key, n_mods)[mod_index]
    eps = float(jnp.finfo(jnp.float32).eps)
    u = jax.random.uniform(key, shape, dtype=jnp.float32,
                           minval=-0.5 + eps, maxval=0.5)
    return np.asarray(u)


def _train_torch_mmvae(params, data, dims, latent, K, n_epochs, batch_size):
    """Reference-style MMVAE DReG training loop in torch
    (``src/multivae/models/mmvae/mmvae_model.py:95-272``):
    laplace-with-softmax posteriors and learnable prior, K importance
    samples, detached-posterior mixture density, ``wk`` softmax weights
    computed under ``no_grad``, and the reference's ``register_hook``
    z-cotangent scaling — the mutable-hook counterpart of our
    ``ops/dreg.scale_grad`` custom_vjp."""
    import math

    import torch

    modules, t_params = _torch_mlp_modules(params, dims, latent)
    prior_lv = torch.zeros(1, latent, requires_grad=True)
    prior_lv.data = torch.tensor(
        np.asarray(params["model"]["prior_log_var"]))
    optim = torch.optim.Adam(t_params + [prior_lv], lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(optim, **SCHED)
    mods = list(dims)
    M = len(mods)
    n = len(data[mods[0]])
    x_all = {m: torch.tensor(data[m].reshape(n, -1)) for m in mods}

    def laplace_lp(z, mu, scale):
        return (-torch.abs(z - mu) / scale
                - torch.log(2.0 * scale)).sum(-1)

    losses, global_step = [], 0
    for epoch in range(1, n_epochs + 1):
        loss_sum_total = 0.0
        for idx, w_np in _epoch_batches(n, batch_size, epoch):
            w = torch.tensor(w_np)
            x = {m: x_all[m][idx] for m in mods}
            post = {}
            for m in mods:
                enc, _ = modules[m]
                h = torch.relu(enc["l0"](x[m]))
                h = torch.relu(enc["l1"](h))
                mu = enc["mu"](h)
                sigma = torch.softmax(enc["lv"](h), dim=-1) * latent + 1e-6
                post[m] = (mu, sigma)
            # K laplace rsamples per modality with the jitted step's noise
            zs = {}
            for i, m in enumerate(mods):
                mu, sigma = post[m]
                u = torch.tensor(_step_laplace_eps(
                    global_step, M, i, (K, *mu.shape)))
                zs[m] = mu[None] - sigma[None] * torch.sign(u) * torch.log1p(
                    -2.0 * torch.abs(u))
            prior_scale = torch.softmax(prior_lv, dim=-1) * latent + 1e-6
            lws = {}
            for m in mods:
                z = zs[m]
                lpz = laplace_lp(z, torch.zeros(1, latent), prior_scale)
                lqz = torch.stack([
                    laplace_lp(z, post[mq][0].detach(), post[mq][1].detach())
                    for mq in mods])
                lqz = torch.logsumexp(lqz, dim=0) - math.log(M)
                lpx = 0.0
                for mr in mods:
                    _, dec = modules[mr]
                    recon = torch.sigmoid(dec["l1"](torch.relu(
                        dec["l0"](z.reshape(-1, latent))))).reshape(
                        K, -1, x[mr].shape[-1])
                    lp = torch.distributions.Normal(recon, 1.0).log_prob(x[mr])
                    lpx = lpx + lp.sum(-1)
                lws[m] = lpx + lpz - lqz  # (K, B)
            wk = {}
            with torch.no_grad():
                for m, lw in lws.items():
                    wk[m] = (lw - torch.logsumexp(lw, 0, keepdim=True)).exp()
            for m in mods:
                zs[m].register_hook(
                    lambda g, wkm=wk[m]: wkm.unsqueeze(-1) * g)
            total = torch.stack([lws[m] * wk[m] for m in mods]).sum(1)
            total = total.sum(0) / M  # complete data: n_mods_sample == M
            loss = -(total * w).sum()
            optim.zero_grad()
            loss.backward()
            optim.step()
            loss_sum_total += float(loss.detach())
            global_step += 1
        sched.step()
        losses.append(loss_sum_total / n)
    return np.asarray(losses)


def _run_mvtcae_curves(dims, latent, hid, n, batch_size, n_epochs,
                       tmp_path):
    alpha, beta = 0.3, 1.7
    data = _make_data(n, dims)
    enc, dec = _make_nets(dims, latent, hid)
    model = MVTCAE(MVTCAEConfig(
        n_modalities=len(dims), latent_dim=latent, input_dims=dims,
        alpha=alpha, beta=beta), encoders=enc, decoders=dec, seed=0)
    init_params = jax.tree.map(np.asarray, model.params)
    ours, _ = _train_ours(model, data, n_epochs, batch_size, tmp_path)
    theirs = _train_torch_mvtcae(init_params, data, dims, latent, alpha,
                                 beta, n_epochs, batch_size)
    return ours, theirs


def _run_mopoe_curves(dims, latent, hid, n, batch_size, n_epochs, tmp_path):
    beta = 1.3
    data = _make_data(n, dims, seed=6)
    enc, dec = _make_nets(dims, latent, hid)
    model = MoPoE(MoPoEConfig(
        n_modalities=len(dims), latent_dim=latent, input_dims=dims,
        beta=beta), encoders=enc, decoders=dec, seed=0)
    theirs = _train_torch_mopoe(model, data, dims, latent, beta, n_epochs,
                                batch_size)
    ours, _ = _train_ours(model, data, n_epochs, batch_size, tmp_path)
    return ours, theirs


def _run_mmvae_curves(dims, latent, hid, n, batch_size, n_epochs, K,
                      tmp_path):
    data = _make_data(n, dims, seed=7)
    enc, dec = _make_nets(dims, latent, hid)
    model = MMVAE(MMVAEConfig(
        n_modalities=len(dims), latent_dim=latent, input_dims=dims, K=K,
        loss="dreg_looser", prior_and_posterior_dist="laplace_with_softmax",
        learn_prior=True), encoders=enc, decoders=dec, seed=0)
    init_params = jax.tree.map(np.asarray, model.params)
    ours, _ = _train_ours(model, data, n_epochs, batch_size, tmp_path)
    theirs = _train_torch_mmvae(init_params, data, dims, latent, K,
                                n_epochs, batch_size)
    return ours, theirs


def test_mvtcae_train_curve_matches_torch_replica(tmp_path):
    """3 epochs, tiny nets, non-divisible dataset (exercises padding)."""
    ours, theirs = _run_mvtcae_curves(
        dims={"m0": (4,), "m1": (6,)}, latent=5, hid=32, n=100,
        batch_size=16, n_epochs=3, tmp_path=tmp_path)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_mvtcae_plateau_fused_curve_matches_torch_replica(tmp_path):
    """Our fused-block IN-GRAPH ReduceLROnPlateau (f32 carry threading
    block-to-block, ``_plateau_block_mode``) vs TORCH'S OWN
    ``ReduceLROnPlateau`` stepping on the epoch train loss: 8 epochs
    with params that force LR halvings mid-run. Pins that the carried
    decision logic AND the LR the optimizer actually consumes match the
    reference scheduler over a trajectory, not just one update."""
    alpha, beta = 0.3, 1.7
    dims = {"m0": (4,), "m1": (6,)}
    latent, hid, n, batch_size, n_epochs = 5, 32, 100, 16, 8
    plateau = {"patience": 1, "threshold": 0.2, "factor": 0.5}
    data = _make_data(n, dims)
    enc, dec = _make_nets(dims, latent, hid)
    model = MVTCAE(MVTCAEConfig(
        n_modalities=len(dims), latent_dim=latent, input_dims=dims,
        alpha=alpha, beta=beta), encoders=enc, decoders=dec, seed=0)
    init_params = jax.tree.map(np.asarray, model.params)
    ours, trainer = _train_ours(
        model, data, n_epochs, batch_size, tmp_path,
        scheduler=("ReduceLROnPlateau", plateau),
        cache_on_device=True, steps_per_execution=100, pipeline_depth=2)
    assert any(isinstance(k, tuple) and k[0] == "block"
               for k in trainer._cached_train_fns), "plateau blocks off"
    theirs = _train_torch_mvtcae(init_params, data, dims, latent, alpha,
                                 beta, n_epochs, batch_size,
                                 plateau=plateau)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)
    # the schedule must actually have fired (at least one halving), and
    # our final LR must equal torch's
    assert trainer.current_learning_rate < LR * 0.9
    import torch  # noqa: F401  (replica already imported it)
    assert trainer.current_learning_rate == pytest.approx(
        _torch_final_plateau_lr(init_params, data, dims, latent, alpha,
                                beta, n_epochs, batch_size, plateau),
        rel=1e-6)


def _torch_final_plateau_lr(params, data, dims, latent, alpha, beta,
                            n_epochs, batch_size, plateau):
    """Final optimizer LR of the torch replica run (re-run; cheap at
    this scale)."""
    import torch

    modules, t_params = _torch_mlp_modules(params, dims, latent)
    optim = torch.optim.Adam(t_params, lr=LR)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(optim, **plateau)
    losses = _train_torch_mvtcae(params, data, dims, latent, alpha, beta,
                                 n_epochs, batch_size, plateau=plateau)
    for ls in losses:
        sched.step(float(ls))
    return optim.param_groups[0]["lr"]


def test_mopoe_train_curve_matches_torch_replica(tmp_path):
    ours, theirs = _run_mopoe_curves(
        dims={"m0": (4,), "m1": (6,), "m2": (3,)}, latent=5, hid=32, n=100,
        batch_size=16, n_epochs=3, tmp_path=tmp_path)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_mmvae_dreg_train_curve_matches_torch_replica(tmp_path):
    """3 epochs, K=4 DReG: pins that the custom_vjp DReG estimator
    (``ops/dreg.scale_grad``) tracks the reference's mutable grad hook
    over an optimization trajectory, not just one step."""
    ours, theirs = _run_mmvae_curves(
        dims={"m0": (4,), "m1": (6,)}, latent=5, hid=32, n=100,
        batch_size=16, n_epochs=3, K=4, tmp_path=tmp_path)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


@pytest.mark.slow
def test_mmvae_dreg_train_curve_parity_12_epochs(tmp_path):
    """The K-sample flagship trajectory pin (VERDICT r4 #4): 12 epochs of
    MMVAE K=4 DReG at MnistSvhn-ish MLP scale vs the faithful torch
    grad-hook replica with matched Laplace noise — the strongest
    available evidence that the two-pass scale_grad formulation doesn't
    drift over hundreds of Adam steps."""
    ours, theirs = _run_mmvae_curves(
        dims={"m0": (1, 28, 28), "m1": (3, 32, 32)}, latent=64, hid=256,
        n=512, batch_size=64, n_epochs=12, K=4, tmp_path=tmp_path)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3)
    assert ours[-1] < ours[0] - 1.0


@pytest.mark.slow
def test_mvtcae_train_curve_parity_mnistsvhn_scale(tmp_path):
    """The north-star demonstration: 12 epochs at MnistSvhn scale (image
    dims (1,28,28)/(3,32,32), MLP-256 nets, latent 64) with a stepped
    scheduler — per-epoch ELBO curves match the torch replica within float
    noise over the whole run."""
    ours, theirs = _run_mvtcae_curves(
        dims={"m0": (1, 28, 28), "m1": (3, 32, 32)}, latent=64, hid=256,
        n=512, batch_size=64, n_epochs=12, tmp_path=tmp_path)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3)
    # and the curve is actually learning, not flat
    assert ours[-1] < ours[0] - 1.0


@pytest.mark.slow
def test_mopoe_train_curve_parity_mnistsvhn_scale(tmp_path):
    ours, theirs = _run_mopoe_curves(
        dims={"m0": (1, 28, 28), "m1": (3, 32, 32)}, latent=64, hid=256,
        n=512, batch_size=64, n_epochs=12, tmp_path=tmp_path)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3)
    assert ours[-1] < ours[0] - 1.0
