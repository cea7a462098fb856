"""Cross-framework numerical parity: our JAX models vs the reference math
re-implemented in torch with IDENTICAL weights.

This is the strongest correctness check available without importing the
reference library (its pythae dependency is not installed): the reference's
loss formulas are written out in torch (from
``src/multivae/models/mvtcae/mvtcae_model.py`` and
``jmvae_model.py``), our flax parameters are copied into the torch modules,
and losses are compared on the same inputs with the same latent samples.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import MVTCAE, MVTCAEConfig

DIMS = {"m0": (4,), "m1": (6,)}
LATENT = 5
HID = 32


def _torch_mlp_encoder(flax_params, in_dim, torch_module=None):
    """Build a torch replica of Encoder_VAE_MLP and copy flax weights."""
    import torch
    import torch.nn as tnn

    layers = tnn.ModuleList([
        tnn.Sequential(tnn.Linear(in_dim, HID), tnn.ReLU()),
        tnn.Sequential(tnn.Linear(HID, HID), tnn.ReLU()),
    ])
    emb = tnn.Linear(HID, LATENT)
    lv = tnn.Linear(HID, LATENT)

    p = flax_params

    def cp(torch_linear, dense):
        torch_linear.weight.data = torch.tensor(
            np.asarray(p[dense]["kernel"]).T)
        torch_linear.bias.data = torch.tensor(np.asarray(p[dense]["bias"]))

    cp(layers[0][0], "Dense_0")
    cp(layers[1][0], "Dense_1")
    cp(emb, "Dense_2")
    cp(lv, "Dense_3")

    def forward(x):
        h = x.reshape(-1, in_dim)
        for lyr in layers:
            h = lyr(h)
        return emb(h), lv(h)

    return forward


def _torch_mlp_decoder(flax_params, out_dim):
    import torch
    import torch.nn as tnn

    l1 = tnn.Linear(LATENT, HID)
    l2 = tnn.Linear(HID, out_dim)
    p = flax_params

    def cp(torch_linear, dense):
        torch_linear.weight.data = torch.tensor(
            np.asarray(p[dense]["kernel"]).T)
        torch_linear.bias.data = torch.tensor(np.asarray(p[dense]["bias"]))

    cp(l1, "Dense_0")
    cp(l2, "Dense_1")

    def forward(z):
        h = torch.relu(l1(z))
        return torch.sigmoid(l2(h))

    return forward


@pytest.fixture
def setup():
    from multivae_tpu.nn import BaseAEConfig, Decoder_AE_MLP, Encoder_VAE_MLP

    encoders = {
        m: Encoder_VAE_MLP(BaseAEConfig(input_dim=d, latent_dim=LATENT),
                           hidden_dim=HID)
        for m, d in DIMS.items()
    }
    decoders = {
        m: Decoder_AE_MLP(BaseAEConfig(input_dim=d, latent_dim=LATENT),
                          hidden_dim=HID)
        for m, d in DIMS.items()
    }
    model = MVTCAE(
        MVTCAEConfig(n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
                     alpha=0.3, beta=1.7),
        encoders=encoders, decoders=decoders, seed=0,
    )
    rng = np.random.default_rng(0)
    data = {m: rng.uniform(size=(8, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    return model, data


def test_mvtcae_joint_posterior_matches_torch(setup):
    import torch

    model, data = setup
    batch = as_batch(MultimodalBaseDataset(data)[:])
    mus, lvs, _ = model.stacked_gaussian_params(model.params, batch)

    for i, m in enumerate(DIMS):
        enc = _torch_mlp_encoder(model.params["encoders"][m],
                                 int(np.prod(DIMS[m])))
        t_mu, t_lv = enc(torch.tensor(data[m]))
        np.testing.assert_allclose(np.asarray(mus[i]),
                                   t_mu.detach().numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lvs[i]),
                                   t_lv.detach().numpy(), atol=2e-5)

    # PoE parity (reference poe, base_utils.py:122-130)
    jmu, jlv, _ = model._joint_posterior(model.params, batch)
    t_mus = torch.stack([
        _torch_mlp_encoder(model.params["encoders"][m],
                           int(np.prod(DIMS[m])))(torch.tensor(data[m]))[0]
        for m in DIMS
    ])
    t_lvs = torch.stack([
        _torch_mlp_encoder(model.params["encoders"][m],
                           int(np.prod(DIMS[m])))(torch.tensor(data[m]))[1]
        for m in DIMS
    ])
    var = torch.exp(t_lvs) + 1e-8
    T = 1.0 / var
    ref_mu = (t_mus * T).sum(0) / T.sum(0)
    ref_lv = torch.log(1.0 / T.sum(0))
    np.testing.assert_allclose(np.asarray(jmu), ref_mu.detach().numpy(),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(jlv), ref_lv.detach().numpy(),
                               atol=3e-5)


def test_mvtcae_loss_matches_torch_reference_math(setup):
    """Full loss parity with the reference forward
    (mvtcae_model.py:42-108), evaluated at z = posterior mean."""
    import torch

    model, data = setup
    batch = as_batch(MultimodalBaseDataset(data)[:])

    # --- our loss with z = joint mean (return_mean path): recompute the
    # loss manually with the same deterministic z
    params = model.params
    jmu, jlv, (mus, lvs, mask) = model._joint_posterior(params, batch)
    z = jmu  # deterministic

    from multivae_tpu.models.base.base_ae_model import sum_except_batch

    n_data = 8.0
    joint_kld = float(jnp.sum(-0.5 * jnp.sum(
        1.0 - jnp.exp(jlv) - jmu**2 + jlv, axis=-1)))
    loss_rec = 0.0
    for m in DIMS:
        recon = model.decode_mod(params, m, z)
        rec = sum_except_batch(-model.recon_log_probs[m](recon,
                                                         batch.data[m]))
        loss_rec += float(rec.sum())
    kld_losses = 0.0
    for i, m in enumerate(DIMS):
        kld_m = -0.5 * jnp.sum(
            1.0 - jnp.exp(jlv - lvs[i]) - (jmu - mus[i]) ** 2
            / jnp.exp(lvs[i]) + jlv - lvs[i], axis=-1)
        kld_losses += float(kld_m.sum())
    M, alpha, beta = 2.0, 0.3, 1.7
    ours = ((M - alpha) / M * loss_rec
            + beta * (alpha / M * kld_losses + (1 - alpha) * joint_kld))

    # --- the same math in torch with the copied weights
    t_encs = {m: _torch_mlp_encoder(params["encoders"][m],
                                    int(np.prod(DIMS[m]))) for m in DIMS}
    t_decs = {m: _torch_mlp_decoder(params["decoders"][m],
                                    int(np.prod(DIMS[m]))) for m in DIMS}
    t_mus, t_lvs = zip(*[t_encs[m](torch.tensor(data[m])) for m in DIMS])
    t_mus, t_lvs = torch.stack(t_mus), torch.stack(t_lvs)
    T = 1.0 / (torch.exp(t_lvs) + 1e-8)
    t_jmu = (t_mus * T).sum(0) / T.sum(0)
    t_jlv = torch.log(1.0 / T.sum(0))
    t_z = t_jmu

    t_joint_kld = -0.5 * torch.sum(1 - t_jlv.exp() - t_jmu.pow(2) + t_jlv)
    t_loss_rec = 0.0
    for m in DIMS:
        t_recon = t_decs[m](t_z)
        lp = torch.distributions.Normal(t_recon, 1.0).log_prob(
            torch.tensor(data[m]).reshape(8, -1))
        t_loss_rec = t_loss_rec + (-lp).sum()
    t_klds = 0.0
    for i, m in enumerate(DIMS):
        t_klds = t_klds + (-0.5 * (
            1 - (t_jlv - t_lvs[i]).exp()
            - (t_jmu - t_mus[i]).pow(2) / t_lvs[i].exp()
            + t_jlv - t_lvs[i]
        ).sum())
    theirs = float((M - alpha) / M * t_loss_rec
                   + beta * (alpha / M * t_klds + (1 - alpha) * t_joint_kld))

    assert ours == pytest.approx(theirs, rel=2e-4)


def test_mvtcae_loss_function_agrees_with_manual(setup):
    """model.loss_function with a fixed rng must reproduce the manual
    computation with the same z (validates the weighting plumbing)."""
    model, data = setup
    batch = as_batch(MultimodalBaseDataset(data)[:])
    from multivae_tpu.models.base.step import StepInfo
    from multivae_tpu.ops.gaussian import rsample_from_gaussian

    rng = jax.random.key(3)
    out = model.loss_function(model.params, batch, rng, StepInfo.create())

    params = model.params
    jmu, jlv, (mus, lvs, _) = model._joint_posterior(params, batch)
    z = rsample_from_gaussian(rng, jmu, jlv)

    from multivae_tpu.models.base.base_ae_model import sum_except_batch

    joint_kld = float(jnp.sum(-0.5 * jnp.sum(
        1.0 - jnp.exp(jlv) - jmu**2 + jlv, axis=-1)))
    loss_rec = sum(
        float(sum_except_batch(-model.recon_log_probs[m](
            model.decode_mod(params, m, z), batch.data[m])).sum())
        for m in DIMS
    )
    kld_losses = sum(
        float((-0.5 * jnp.sum(
            1.0 - jnp.exp(jlv - lvs[i]) - (jmu - mus[i]) ** 2
            / jnp.exp(lvs[i]) + jlv - lvs[i], axis=-1)).sum())
        for i, m in enumerate(DIMS)
    )
    M, alpha, beta = 2.0, 0.3, 1.7
    manual = ((M - alpha) / M * loss_rec
              + beta * (alpha / M * kld_losses + (1 - alpha) * joint_kld))
    assert float(out.loss_sum) == pytest.approx(manual, rel=1e-5)


def test_one_adam_step_matches_torch(setup):
    """One Adam step in optax vs torch on the copied weights must land on
    the same loss (validates gradient + optimizer parity end to end)."""
    import optax
    import torch

    model, data = setup
    batch = as_batch(MultimodalBaseDataset(data)[:])

    # ---- our side: grads of the deterministic (z = mean) loss
    def our_loss(params):
        jmu, jlv, (mus, lvs, _) = model._joint_posterior(params, batch)
        z = jmu
        from multivae_tpu.models.base.base_ae_model import sum_except_batch

        joint_kld = jnp.sum(-0.5 * jnp.sum(
            1.0 - jnp.exp(jlv) - jmu**2 + jlv, axis=-1))
        loss_rec = 0.0
        for m in DIMS:
            recon = model.decode_mod(params, m, z)
            loss_rec += sum_except_batch(
                -model.recon_log_probs[m](recon, batch.data[m])).sum()
        kld_losses = 0.0
        for i, m in enumerate(DIMS):
            kld_losses += (-0.5 * jnp.sum(
                1.0 - jnp.exp(jlv - lvs[i]) - (jmu - mus[i]) ** 2
                / jnp.exp(lvs[i]) + jlv - lvs[i], axis=-1)).sum()
        M, alpha, beta = 2.0, 0.3, 1.7
        return ((M - alpha) / M * loss_rec
                + beta * (alpha / M * kld_losses
                          + (1 - alpha) * joint_kld)) / 8.0

    lr = 1e-2
    opt = optax.adam(lr)
    grads = jax.grad(our_loss)(model.params)
    updates, _ = opt.update(grads, opt.init(model.params), model.params)
    new_params = optax.apply_updates(model.params, updates)
    ours_after = float(our_loss(new_params))

    # ---- torch side: same math, same weights, one torch.optim.Adam step
    t_encs, t_decs, t_params = {}, {}, []
    import torch.nn as tnn

    modules = {}
    for m in DIMS:
        in_dim = int(np.prod(DIMS[m]))
        enc = tnn.ModuleDict({
            "l0": tnn.Linear(in_dim, HID), "l1": tnn.Linear(HID, HID),
            "mu": tnn.Linear(HID, LATENT), "lv": tnn.Linear(HID, LATENT),
        })
        dec = tnn.ModuleDict({
            "l0": tnn.Linear(LATENT, HID),
            "l1": tnn.Linear(HID, in_dim),
        })
        pe = model.params["encoders"][m]
        pd = model.params["decoders"][m]

        def cp(lin, tree, name):
            lin.weight.data = torch.tensor(np.asarray(tree[name]["kernel"]).T)
            lin.bias.data = torch.tensor(np.asarray(tree[name]["bias"]))

        cp(enc["l0"], pe, "Dense_0")
        cp(enc["l1"], pe, "Dense_1")
        cp(enc["mu"], pe, "Dense_2")
        cp(enc["lv"], pe, "Dense_3")
        cp(dec["l0"], pd, "Dense_0")
        cp(dec["l1"], pd, "Dense_1")
        modules[m] = (enc, dec)
        t_params.extend(list(enc.parameters()) + list(dec.parameters()))

    def torch_loss():
        mus, lvs = [], []
        for m in DIMS:
            enc, _ = modules[m]
            h = torch.relu(enc["l0"](torch.tensor(data[m])))
            h = torch.relu(enc["l1"](h))
            mus.append(enc["mu"](h))
            lvs.append(enc["lv"](h))
        t_mus, t_lvs = torch.stack(mus), torch.stack(lvs)
        T = 1.0 / (torch.exp(t_lvs) + 1e-8)
        jmu = (t_mus * T).sum(0) / T.sum(0)
        jlv = torch.log(1.0 / T.sum(0))
        z = jmu
        joint_kld = -0.5 * torch.sum(1 - jlv.exp() - jmu.pow(2) + jlv)
        loss_rec = 0.0
        for m in DIMS:
            _, dec = modules[m]
            recon = torch.sigmoid(dec["l1"](torch.relu(dec["l0"](z))))
            lp = torch.distributions.Normal(recon, 1.0).log_prob(
                torch.tensor(data[m]).reshape(8, -1))
            loss_rec = loss_rec + (-lp).sum()
        klds = 0.0
        for i in range(len(mus)):
            klds = klds + (-0.5 * (
                1 - (jlv - t_lvs[i]).exp()
                - (jmu - t_mus[i]).pow(2) / t_lvs[i].exp() + jlv - t_lvs[i]
            ).sum())
        M, alpha, beta = 2.0, 0.3, 1.7
        return ((M - alpha) / M * loss_rec
                + beta * (alpha / M * klds + (1 - alpha) * joint_kld)) / 8.0

    optim = torch.optim.Adam(t_params, lr=lr)
    loss = torch_loss()
    loss.backward()
    optim.step()
    theirs_after = float(torch_loss())

    assert ours_after == pytest.approx(theirs_after, rel=1e-3)


def test_mmvae_iwae_looser_matches_torch_reference_math():
    """MoE-family parity: the reference's iwae_looser loss
    (``mmvae_model.py:160-292``) re-implemented in torch with the SAME
    weights and the SAME fixed latent samples."""
    import math

    import torch

    from multivae_tpu.models import MMVAE, MMVAEConfig
    from multivae_tpu.models.base.step import StepInfo
    from multivae_tpu.nn import BaseAEConfig, Decoder_AE_MLP, Encoder_VAE_MLP

    K = 4
    encoders = {
        m: Encoder_VAE_MLP(BaseAEConfig(input_dim=d, latent_dim=LATENT),
                           hidden_dim=HID)
        for m, d in DIMS.items()
    }
    decoders = {
        m: Decoder_AE_MLP(BaseAEConfig(input_dim=d, latent_dim=LATENT),
                          hidden_dim=HID)
        for m, d in DIMS.items()
    }
    model = MMVAE(
        MMVAEConfig(n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
                    K=K, loss="iwae_looser", learn_prior=False,
                    prior_and_posterior_dist="laplace_with_softmax",
                    decoders_dist={m: "laplace" for m in DIMS}),
        encoders=encoders, decoders=decoders, seed=0,
    )
    rng = np.random.default_rng(0)
    data = {m: rng.uniform(size=(8, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])

    # fixed latent samples shared by both frameworks
    zs = {m: rng.normal(size=(K, 8, LATENT)).astype(np.float32)
          for m in DIMS}

    # ours
    post_params = model._posterior_params(model.params, batch)
    ours = float(model._iwae_looser(
        model.params, batch, post_params,
        {m: jnp.asarray(z) for m, z in zs.items()},
    ).loss)

    # torch replica (reference formulas)
    t_enc = {m: _torch_mlp_encoder(model.params["encoders"][m],
                                   int(np.prod(DIMS[m]))) for m in DIMS}
    t_dec = {m: _torch_mlp_decoder(model.params["decoders"][m],
                                   int(np.prod(DIMS[m]))) for m in DIMS}
    x = {m: torch.tensor(data[m]) for m in DIMS}
    tz = {m: torch.tensor(zs[m]) for m in DIMS}

    def softmax_scale(lv):
        return torch.softmax(lv, dim=-1) * lv.shape[-1] + 1e-6

    qz = {}
    for m in DIMS:
        mu, lv = t_enc[m](x[m])
        qz[m] = torch.distributions.Laplace(mu, softmax_scale(lv))
    prior = torch.distributions.Laplace(
        torch.zeros(LATENT), torch.full((LATENT,), 1.0 + 1e-6))

    lws = []
    for m in DIMS:
        z = tz[m]
        lpz = prior.log_prob(z).sum(-1)
        lqz_x = torch.logsumexp(torch.stack(
            [qz[mm].log_prob(z).sum(-1) for mm in DIMS]), dim=0
        ) - math.log(len(DIMS))
        lpx_z = 0
        for rm in DIMS:
            recon = t_dec[rm](z.reshape(-1, LATENT)).reshape(
                K, 8, -1)
            lp = torch.distributions.Laplace(recon, 1.0).log_prob(
                x[rm].reshape(8, -1)).sum(-1)
            lpx_z = lpx_z + lp
        lws.append(lpx_z + lpz - lqz_x)
    stacked = torch.stack(lws)                       # (M, K, B)
    k_est = torch.logsumexp(stacked, dim=1) - math.log(K)
    theirs = float(-(k_est.sum(0) / len(DIMS)).sum())

    assert ours == pytest.approx(theirs, rel=2e-4)


def test_mmvae_dreg_gradients_match_torch_hook():
    """DReG gradient parity: the reference scales the z cotangent with a
    mutable backward hook (``mmvae_model.py:262-266``); ours uses the
    scale_grad custom_vjp. Same weights + same fixed z => identical loss,
    z-gradients and decoder gradients."""
    import math

    import torch

    from multivae_tpu.models import MMVAE, MMVAEConfig

    K = 4
    from multivae_tpu.nn import BaseAEConfig, Decoder_AE_MLP, Encoder_VAE_MLP

    encoders = {
        m: Encoder_VAE_MLP(BaseAEConfig(input_dim=d, latent_dim=LATENT),
                           hidden_dim=HID)
        for m, d in DIMS.items()
    }
    decoders = {
        m: Decoder_AE_MLP(BaseAEConfig(input_dim=d, latent_dim=LATENT),
                          hidden_dim=HID)
        for m, d in DIMS.items()
    }
    model = MMVAE(
        MMVAEConfig(n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
                    K=K, loss="dreg_looser", learn_prior=False,
                    prior_and_posterior_dist="laplace_with_softmax",
                    decoders_dist={m: "laplace" for m in DIMS}),
        encoders=encoders, decoders=decoders, seed=0,
    )
    rng = np.random.default_rng(1)
    data = {m: rng.uniform(size=(8, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])
    zs_np = {m: rng.normal(size=(K, 8, LATENT)).astype(np.float32)
             for m in DIMS}

    # ---- ours: loss + grads w.r.t. z and decoder params
    post_params = model._posterior_params(model.params, batch)

    def our_loss(zs, params):
        return model._dreg_looser(params, batch, post_params, zs).loss

    zs_j = {m: jnp.asarray(z) for m, z in zs_np.items()}
    ours = float(our_loss(zs_j, model.params))
    gz = jax.grad(our_loss, argnums=0)(zs_j, model.params)
    gdec = jax.grad(lambda p: our_loss(zs_j, p))(model.params)["decoders"]

    # ---- torch replica with the reference's register_hook mechanism
    t_enc = {m: _torch_mlp_encoder(model.params["encoders"][m],
                                   int(np.prod(DIMS[m]))) for m in DIMS}

    t_dec_mods = {}
    import torch.nn as tnn

    for m in DIMS:
        l1 = tnn.Linear(LATENT, HID)
        l2 = tnn.Linear(HID, int(np.prod(DIMS[m])))
        p = model.params["decoders"][m]
        l1.weight.data = torch.tensor(np.asarray(p["Dense_0"]["kernel"]).T)
        l1.bias.data = torch.tensor(np.asarray(p["Dense_0"]["bias"]))
        l2.weight.data = torch.tensor(np.asarray(p["Dense_1"]["kernel"]).T)
        l2.bias.data = torch.tensor(np.asarray(p["Dense_1"]["bias"]))
        t_dec_mods[m] = (l1, l2)

    x = {m: torch.tensor(data[m]) for m in DIMS}
    tz = {m: torch.tensor(zs_np[m], requires_grad=True) for m in DIMS}

    def softmax_scale(lv):
        return torch.softmax(lv, dim=-1) * lv.shape[-1] + 1e-6

    qz = {}
    for m in DIMS:
        with torch.no_grad():  # detached posteriors (DReG)
            mu, lv = t_enc[m](x[m])
        qz[m] = torch.distributions.Laplace(mu, softmax_scale(lv))
    prior = torch.distributions.Laplace(
        torch.zeros(LATENT), torch.full((LATENT,), 1.0 + 1e-6))

    lws = {}
    for m in DIMS:
        z = tz[m]
        lpz = prior.log_prob(z).sum(-1)
        lqz_x = torch.logsumexp(torch.stack(
            [qz[mm].log_prob(z).sum(-1) for mm in DIMS]), dim=0
        ) - math.log(len(DIMS))
        lpx_z = 0
        for rm in DIMS:
            l1, l2 = t_dec_mods[rm]
            recon = torch.sigmoid(l2(torch.relu(l1(z.reshape(-1, LATENT)))))
            lp = torch.distributions.Laplace(
                recon.reshape(K, 8, -1), 1.0).log_prob(
                x[rm].reshape(8, -1)).sum(-1)
            lpx_z = lpx_z + lp
        lws[m] = lpx_z + lpz - lqz_x

    wk = {}
    with torch.no_grad():
        for m, lw in lws.items():
            wk[m] = (lw - torch.logsumexp(lw, 0, keepdim=True)).exp()
    stacked = torch.stack([lws[m] * wk[m] for m in DIMS]).sum(1)
    for m in DIMS:
        tz[m].register_hook(lambda grad, w=wk[m]: w.unsqueeze(-1) * grad)
    theirs_t = -(stacked.sum(0) / len(DIMS)).sum()
    theirs_t.backward()

    assert ours == pytest.approx(float(theirs_t), rel=2e-4)
    for m in DIMS:
        np.testing.assert_allclose(
            np.asarray(gz[m]), tz[m].grad.numpy(), rtol=2e-3, atol=1e-5)
    for m in DIMS:
        l1, l2 = t_dec_mods[m]
        np.testing.assert_allclose(
            np.asarray(gdec[m]["Dense_0"]["kernel"]),
            l1.weight.grad.numpy().T, rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gdec[m]["Dense_1"]["kernel"]),
            l2.weight.grad.numpy().T, rtol=2e-3, atol=1e-5)


def test_cmvae_k_lws_matches_torch_reference_math():
    """CMVAE cluster-prior objective parity: the reference's explicit
    per-cluster expectation (``cmvae_model.py:247-345``) re-implemented in
    torch with the SAME weights, latents and cross-modal prior draws."""
    import math

    import torch

    from multivae_tpu.models import CMVAE, CMVAEConfig
    from multivae_tpu.nn import BaseAEConfig

    K, STYLE, C = 3, 3, 4
    model = CMVAE(CMVAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS, K=K,
        modalities_specific_dim=STYLE, number_of_clusters=C, beta=1.3,
        prior_and_posterior_dist="laplace_with_softmax",
        decoders_dist={m: "laplace" for m in DIMS},
    ), seed=0)
    rng = np.random.default_rng(2)
    data = {m: rng.uniform(size=(8, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])
    mods = list(DIMS)

    posteriors = model._posteriors(model.params, batch)
    zs = {m: {"u": jnp.asarray(rng.normal(
                  size=(K, 8, LATENT)).astype(np.float32)),
              "w": jnp.asarray(rng.normal(
                  size=(K, 8, STYLE)).astype(np.float32))}
          for m in mods}
    recons, cross_w = model._reconstructions(
        model.params, batch, posteriors, zs, jax.random.key(3), K)
    lws, _ = model._compute_k_lws(model.params, batch, posteriors, zs,
                                  recons, detach_posteriors=False)

    # ---------------- torch replica
    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731

    def softmax_scale(lv):
        return torch.softmax(lv, dim=-1) * lv.shape[-1] + 1e-6

    # posteriors (same param trees -> same mu/sigma; just convert)
    qz = {m: {
        "u": torch.distributions.Laplace(t(posteriors[m]["u"][0]),
                                         t(posteriors[m]["u"][1])),
        "w": torch.distributions.Laplace(t(posteriors[m]["w"][0]),
                                         t(posteriors[m]["w"][1])),
    } for m in mods}

    w_mu_p, w_std_p = model._w_prior()
    w_prior = torch.distributions.Laplace(t(w_mu_p), t(w_std_p))
    pc = t(model.pc_params_probs(model.params))
    lpc = torch.log(pc)
    means_c = t(model.params["model"]["mean_clusters"])
    stds_c = t(model._cluster_stds(model.params))

    # decoders: reuse OUR decode outputs (recons) — weight copying is
    # already covered by the other parity tests; here the target is the
    # cluster objective, so recon log-probs are computed in torch from
    # the same reconstruction tensors.
    x = {m: torch.tensor(data[m]) for m in mods}

    lws_t = {}
    for j, mod in enumerate(mods):
        u = t(zs[mod]["u"])
        w = t(zs[mod]["w"])
        lpw = w_prior.log_prob(w).sum(-1)
        lqw_x = qz[mod]["w"].log_prob(w).sum(-1)
        lqu_x = torch.logsumexp(torch.stack(
            [qz[m]["u"].log_prob(u).sum(-1) for m in mods]), dim=0
        ) - math.log(len(mods))
        lpzc = torch.stack([
            torch.distributions.Laplace(means_c[c], stds_c[c]).log_prob(
                u).sum(-1)
            for c in range(C)
        ])                                            # (C, K, B)
        qzc = torch.softmax(lpc.view(C, 1, 1) + lpzc, dim=0) + 1e-20
        lpx_z = 0
        for rm in mods:
            x_recon = t(recons[rm][j])                # (K, B, *dims)
            lp = torch.distributions.Laplace(
                x_recon.reshape(K, 8, -1), 1.0).log_prob(
                x[rm].reshape(8, -1)).sum(-1)
            lpx_z = lpx_z + lp
        lw = 0
        for c in range(C):
            lw_c = lpx_z + model.model_config.beta * (
                lpc[c] + lpzc[c] + lpw - lqu_x - lqw_x - qzc[c].log())
            lw = lw + qzc[c] * lw_c
        lws_t[mod] = lw

    for m in mods:
        np.testing.assert_allclose(
            np.asarray(lws[m]), lws_t[m].numpy(), rtol=3e-4, atol=3e-3)


def test_mopoe_subset_poe_matches_torch_loops():
    """MoPoE subset machinery parity: our (S, M) mask-matrix einsum vs the
    reference's per-subset Python loops + poe (``mopoe_model.py:249-320``),
    and the developed joint divergence (``:108-146``)."""
    import itertools

    import torch

    from multivae_tpu.data.batch import MultimodalBatch
    from multivae_tpu.models import MoPoE, MoPoEConfig

    mods3 = {"a": (3,), "b": (4,), "c": (5,)}
    model = MoPoE(MoPoEConfig(n_modalities=3, latent_dim=LATENT,
                              input_dims=mods3), seed=0)
    rng = np.random.default_rng(3)
    B = 8
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in mods3.items()}
    batch = MultimodalBatch(
        data={m: jnp.asarray(v) for m, v in data.items()},
        masks={m: jnp.ones((B,)) for m in mods3},
        weights=jnp.ones((B,)), labels=None, incomplete=False,
    )
    mus_sub, lvs_sub, enc = model._all_subset_posteriors(model.params, batch)

    # torch replica over explicit subsets, in the same enumeration order
    mod_list = list(mods3)
    subsets = []
    for n in range(1, len(mod_list) + 1):
        subsets += [list(c) for c in itertools.combinations(mod_list, n)]
    # align with the model's own subset ordering
    assert len(subsets) == mus_sub.shape[0]

    mu_t = {m: torch.tensor(np.asarray(enc[m]["embedding"]))
            for m in mod_list}
    lv_t = {m: torch.tensor(np.asarray(enc[m]["log_covariance"]))
            for m in mod_list}
    eps = 1e-8

    def torch_poe(mus, logvars):
        var = torch.exp(logvars) + eps
        T = 1.0 / var
        joint_mu = (mus * T).sum(0) / T.sum(0)
        joint_lv = torch.log(1.0 / T.sum(0))
        return joint_mu, joint_lv

    order = [list(s) for s in model.subsets.values()]
    for i, subset in enumerate(order):
        mus = torch.stack([mu_t[m] for m in subset])
        lvs = torch.stack([lv_t[m] for m in subset])
        if len(subset) == len(mod_list):  # prior expert for the full set
            mus = torch.cat([mus, torch.zeros(1, B, LATENT)], dim=0)
            lvs = torch.cat([lvs, torch.zeros(1, B, LATENT)], dim=0)
        jm, jl = torch_poe(mus, lvs)
        np.testing.assert_allclose(np.asarray(mus_sub[i]), jm.numpy(),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lvs_sub[i]), jl.numpy(),
                                   rtol=1e-5, atol=1e-5)

    # developed joint divergence with uniform weights
    S = mus_sub.shape[0]
    weights = torch.full((S, B), 1.0 / S)
    klds = torch.stack([
        -0.5 * (1 - torch.tensor(np.asarray(lvs_sub[k])).exp()
                - torch.tensor(np.asarray(mus_sub[k])).pow(2)
                + torch.tensor(np.asarray(lvs_sub[k]))).sum(-1)
        for k in range(S)
    ])
    group_div_t = float((weights * klds).sum(dim=0).mean())

    import jax.numpy as jnp2

    w = jnp2.full((S, B), 1.0 / S)
    klds_j = -0.5 * jnp2.sum(
        1.0 - jnp2.exp(lvs_sub) - mus_sub**2 + lvs_sub, axis=-1,
        dtype=jnp2.float32)
    group_div_ours = float(((w * klds_j).sum(0) * batch.weights).sum()
                           / B)
    assert group_div_ours == pytest.approx(group_div_t, rel=1e-5)


def test_mvae_incomplete_loss_matches_torch_filtering(monkeypatch):
    """MVAE incomplete-data parity: our weighted masked means must equal
    the reference's row-FILTERING semantics (``mvae_model.py:115-204``)
    with inf-logvar experts in stable_poe. Deterministic via mean-z."""
    import torch

    import multivae_tpu.models.mvae.mvae_model as mvae_mod
    from multivae_tpu.data import IncompleteDataset
    from multivae_tpu.models import MVAE, MVAEConfig
    from multivae_tpu.models.base.step import StepInfo

    # deterministic: z = posterior mean on our side, mu on the torch side
    monkeypatch.setattr(
        mvae_mod, "rsample_from_gaussian",
        lambda rng, mu, lv, **kw: mu,
    )

    model = MVAE(MVAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        warmup=0, beta=1.0, use_subsampling=True, k=0,
        decoders_dist={m: "laplace" for m in DIMS},
    ), seed=0)
    rng = np.random.default_rng(4)
    B = 8
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    masks = {"m0": np.array([1, 1, 1, 0, 1, 0, 1, 1], bool),
             "m1": np.array([1, 0, 1, 1, 0, 0, 1, 1], bool)}
    # reference convention: missing entries zero-filled
    for m in DIMS:
        data[m] = data[m] * masks[m][:, None].astype(np.float32)
    ds = IncompleteDataset(data=data, masks=masks)
    batch = as_batch(ds[:])

    ours = float(model.loss_function(
        model.params, batch, jax.random.key(0), StepInfo.create(epoch=1)
    ).loss)

    # ---- torch replica of the reference forward
    t_enc = {m: _torch_mlp_encoder(model.params["encoders"][m],
                                   int(np.prod(DIMS[m]))) for m in DIMS}
    t_dec = {m: _torch_mlp_decoder(model.params["decoders"][m],
                                   int(np.prod(DIMS[m]))) for m in DIMS}
    x = {m: torch.tensor(data[m]) for m in DIMS}
    tm = {m: torch.tensor(masks[m]) for m in DIMS}

    def stable_poe_t(mus, logvars):
        ln_inv = torch.stack([-l for l in logvars])
        ln_var = -torch.logsumexp(ln_inv, dim=0)
        mu = (torch.exp(ln_inv) * torch.stack(mus)).sum(0) * torch.exp(
            ln_var)
        return mu, ln_var

    def elbo_subset(subset):
        # filter rows available in ANY subset modality
        filt = torch.zeros(B, dtype=torch.bool)
        for m in subset:
            filt = filt | tm[m]
        xs = {m: x[m][filt] for m in subset}
        ms = {m: tm[m][filt] for m in subset}
        mus, lvs = [], []
        for m in subset:
            mu, lv = t_enc[m](xs[m])
            lv = lv.clone()
            lv[~ms[m]] = torch.inf
            mus.append(mu)
            lvs.append(lv)
        mus.append(torch.zeros_like(mus[0]))
        lvs.append(torch.zeros_like(lvs[0]))
        sub_mu, sub_lv = stable_poe_t(mus, lvs)
        z = sub_mu  # deterministic
        elbo = 0.0
        for m in subset:
            recon = t_dec[m](z)
            rec = -torch.distributions.Laplace(recon, 1.0).log_prob(
                xs[m].reshape(len(z), -1)).sum(-1)
            elbo = elbo + (rec * ms[m].float()).sum()
        kld = -0.5 * torch.sum(1 + sub_lv - sub_mu.pow(2) - sub_lv.exp())
        return float((elbo + kld) / len(z))

    theirs = (elbo_subset(list(DIMS)) + elbo_subset(["m0"])
              + elbo_subset(["m1"]))
    assert ours == pytest.approx(theirs, rel=3e-4)


def test_dmvae_loss_matches_torch_reference_math(monkeypatch):
    """DMVAE cross-ELBO parity (``dmvae_model.py:94-231``): joint PoE +
    per-modality shared-posterior ELBOs, private KLs/betas, incomplete
    masks — deterministic via mean-z."""
    import torch

    import multivae_tpu.models.dmvae.dmvae_model as dmvae_mod
    from multivae_tpu.data import IncompleteDataset
    from multivae_tpu.models import DMVAE, DMVAEConfig
    from multivae_tpu.models.base.step import StepInfo

    monkeypatch.setattr(dmvae_mod, "rsample_from_gaussian",
                        lambda rng, mu, lv, **kw: mu)

    STYLE = {"m0": 2, "m1": 3}
    model = DMVAE(DMVAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        modalities_specific_dim=STYLE,
        modalities_specific_betas={"m0": 1.5, "m1": 0.5}, beta=2.0,
        decoders_dist={m: "laplace" for m in DIMS},
    ), seed=0)
    rng = np.random.default_rng(5)
    B = 8
    masks = {"m0": np.array([1, 1, 0, 1, 1, 0, 1, 1], bool),
             "m1": np.ones(B, bool)}
    data = {m: (rng.uniform(size=(B, *d)) * masks[m][:, None]).astype(
        np.float32) for m, d in DIMS.items()}
    ds = IncompleteDataset(data=data, masks=masks)
    batch = as_batch(ds[:])

    ours = float(model.loss_function(
        model.params, batch, jax.random.key(0), StepInfo.create(epoch=1)
    ).loss)

    # ---------------- torch replica
    x = {m: torch.tensor(data[m]) for m in DIMS}
    tm = {m: torch.tensor(masks[m]) for m in DIMS}

    # multilatent MLP encoder replica: 1 hidden, 4 heads
    def enc(m):
        p = model.params["encoders"][m]

        def f(xx):
            h = torch.relu(torch.tensor(np.asarray(p["Dense_0"]["kernel"])).T
                           .matmul(xx.reshape(B, -1).T).T
                           + torch.tensor(np.asarray(p["Dense_0"]["bias"])))
            def head(name):
                return (h.matmul(torch.tensor(
                    np.asarray(p[name]["kernel"])))
                    + torch.tensor(np.asarray(p[name]["bias"])))
            return head("Dense_1"), head("Dense_2"), head("Dense_3"), \
                head("Dense_4")
        return f

    def dec(m):
        p = model.params["decoders"][m]

        def f(z):
            h = torch.relu(z.matmul(torch.tensor(
                np.asarray(p["Dense_0"]["kernel"])))
                + torch.tensor(np.asarray(p["Dense_0"]["bias"])))
            out = h.matmul(torch.tensor(np.asarray(p["Dense_1"]["kernel"]))) \
                + torch.tensor(np.asarray(p["Dense_1"]["bias"]))
            return torch.sigmoid(out)
        return f

    shared, private, poe_lvs = {}, {}, {}
    for m in DIMS:
        mu, lv, smu, slv = enc(m)(x[m])
        shared[m] = (mu, lv)          # ORIGINAL lv for the modality elbos
        lv_poe = lv.clone()           # inf only inside the PoE (reference
        lv_poe[~tm[m]] = torch.inf    # clones before masking, ``:131-134``)
        poe_lvs[m] = lv_poe
        private[m] = (smu, slv)

    def stable_poe_t(mus, lvs):
        ln_inv = torch.stack([-l for l in lvs])
        ln_var = -torch.logsumexp(ln_inv, dim=0)
        mu = (torch.exp(ln_inv) * torch.stack(mus)).sum(0) * torch.exp(
            ln_var)
        return mu, ln_var

    jmu, jlv = stable_poe_t(
        [shared[m][0] for m in DIMS] + [torch.zeros(B, LATENT)],
        [poe_lvs[m] for m in DIMS] + [torch.zeros(B, LATENT)])

    def kl_t(mu, lv):
        return 0.5 * (-lv + lv.exp() + mu.pow(2) - 1).sum(-1)

    def elbo(q_mu, q_lv):
        z_shared = q_mu
        recon_loss = 0
        for m in DIMS:
            z = torch.cat([z_shared, private[m][0]], dim=1)
            r = dec(m)(z)
            lp = torch.distributions.Laplace(r, 1.0).log_prob(
                x[m].reshape(B, -1)).sum(-1)
            recon_loss = recon_loss + lp * tm[m].float()
        kl = kl_t(q_mu, q_lv) * 2.0
        for m in DIMS:
            kl = kl + kl_t(*private[m]) * tm[m].float() * (
                1.5 if m == "m0" else 0.5)
        return -recon_loss + kl

    loss_t = elbo(jmu, jlv)
    for m in DIMS:
        loss_t = loss_t + elbo(*shared[m]) * tm[m].float()
    theirs = float(loss_t.mean())
    assert ours == pytest.approx(theirs, rel=3e-4)


def test_crmvae_loss_matches_torch_reference_math(monkeypatch):
    """CRMVAE parity (``crmvae_model.py:44-113``): masked PoE joint + the
    coordination KLs + dual (joint/unimodal) reconstructions on incomplete
    data — deterministic via mean-z."""
    import torch

    import multivae_tpu.models.crmvae.crmvae_model as crmvae_mod
    from multivae_tpu.data import IncompleteDataset
    from multivae_tpu.models import CRMVAE, CRMVAEConfig
    from multivae_tpu.models.base.step import StepInfo

    monkeypatch.setattr(crmvae_mod, "rsample_from_gaussian",
                        lambda rng, mu, lv, **kw: mu)

    model = CRMVAE(CRMVAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS, beta=1.3,
        decoders_dist={m: "laplace" for m in DIMS},
    ), seed=0)
    rng = np.random.default_rng(6)
    B = 8
    masks = {"m0": np.array([1, 0, 1, 1, 1, 0, 1, 1], bool),
             "m1": np.ones(B, bool)}
    data = {m: (rng.uniform(size=(B, *d)) * masks[m][:, None]).astype(
        np.float32) for m, d in DIMS.items()}
    ds = IncompleteDataset(data=data, masks=masks)
    batch = as_batch(ds[:])

    ours = float(model.loss_function(
        model.params, batch, jax.random.key(0), StepInfo.create(epoch=1)
    ).loss)

    # ---------------- torch replica
    t_enc = {m: _torch_mlp_encoder(model.params["encoders"][m],
                                   int(np.prod(DIMS[m]))) for m in DIMS}
    t_dec = {m: _torch_mlp_decoder(model.params["decoders"][m],
                                   int(np.prod(DIMS[m]))) for m in DIMS}
    x = {m: torch.tensor(data[m]) for m in DIMS}
    tm = {m: torch.tensor(masks[m]) for m in DIMS}

    uni = {}
    poe_lvs = []
    for m in DIMS:
        mu, lv = t_enc[m](x[m])
        uni[m] = (mu, lv)
        lv_poe = lv.clone()
        lv_poe[~tm[m]] = torch.inf
        poe_lvs.append(lv_poe)

    def stable_poe_t(mus, lvs):
        ln_inv = torch.stack([-l for l in lvs])
        ln_var = -torch.logsumexp(ln_inv, dim=0)
        mu = (torch.exp(ln_inv) * torch.stack(mus)).sum(0) * torch.exp(
            ln_var)
        return mu, ln_var

    jmu, jlv = stable_poe_t([uni[m][0] for m in DIMS], poe_lvs)

    def kl_t(mu, lv, pm, plv):
        return 0.5 * (plv - lv + (lv - plv).exp()
                      + (mu - pm).pow(2) / plv.exp() - 1).sum(-1)

    divergence = kl_t(jmu, jlv, torch.zeros(B, LATENT),
                      torch.zeros(B, LATENT))
    for m in DIMS:
        divergence = divergence + kl_t(jmu, jlv, *uni[m]) * tm[m].float()

    z_samples = {"joint": jmu, **{m: uni[m][0] for m in DIMS}}
    loss_rec = 0
    for gm in DIMS:
        for src in ["joint", gm]:
            r = t_dec[gm](z_samples[src])
            lp = -torch.distributions.Laplace(r, 1.0).log_prob(
                x[gm].reshape(B, -1)).sum(-1)
            loss_rec = loss_rec + lp * tm[gm].float()

    M = len(DIMS)
    total = loss_rec / (2 * (M + 1)) + 1.3 * divergence / (M + 1)
    assert ours == pytest.approx(float(total.sum()), rel=3e-4)


def test_nexus_loss_assembly_matches_torch_reference_math(monkeypatch):
    """Nexus loss-assembly parity (``nexus_model.py:80-207``): masked-mean
    aggregation, bottom/top ELBOs, gammas, annealing — computed in torch
    from OUR sub-network outputs (deterministic via mean-z on incomplete
    data, where no perceptual dropout applies)."""
    import torch

    import multivae_tpu.models.nexus.nexus_model as nexus_mod
    from multivae_tpu.data import IncompleteDataset
    from multivae_tpu.models import Nexus, NexusConfig
    from multivae_tpu.models.base.step import StepInfo

    monkeypatch.setattr(nexus_mod, "rsample_from_gaussian",
                        lambda rng, mu, lv, **kw: mu)

    SPEC = {"m0": 3, "m1": 4}
    GAMMAS = {"m0": 2.0, "m1": 0.5}
    BETAS = {"m0": 1.5, "m1": 0.8}
    model = Nexus(NexusConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        modalities_specific_dim=SPEC, msg_dim=6, warmup=2,
        gammas=GAMMAS, bottom_betas=BETAS, top_beta=1.2,
        decoders_dist={m: "laplace" for m in DIMS},
    ), seed=0)
    rng = np.random.default_rng(7)
    B = 8
    masks = {"m0": np.array([1, 1, 0, 1, 1, 1, 0, 1], bool),
             "m1": np.ones(B, bool)}
    data = {m: (rng.uniform(size=(B, *d)) * masks[m][:, None]).astype(
        np.float32) for m, d in DIMS.items()}
    ds = IncompleteDataset(data=data, masks=masks)
    batch = as_batch(ds[:])
    epoch = 5  # past warmup -> annealing = 1

    ours = float(model.loss_function(
        model.params, batch, jax.random.key(0), StepInfo.create(epoch=epoch)
    ).loss)

    # ---- torch assembly from OUR sub-network outputs
    p = model.params
    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    x = {m: torch.tensor(data[m]) for m in DIMS}
    tm = {m: torch.tensor(masks[m]) for m in DIMS}

    bottom_loss = 0
    msgs, z1 = {}, {}
    for m in DIMS:
        out_m = model.encode_mod(p, m, batch.data[m])
        mu, lv = t(out_m["embedding"]), t(out_m["log_covariance"])
        z_m = mu
        recon = t(model.decode_mod(p, m, np.asarray(z_m)))
        nlogprob = -torch.distributions.Laplace(
            recon.reshape(B, -1), 1.0).log_prob(
            x[m].reshape(B, -1)).sum(-1)
        kld = -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=-1)
        m_elbo = (nlogprob + kld * BETAS[m]) * tm[m].float()
        bottom_loss = bottom_loss + m_elbo
        z1[m] = z_m
        msgs[m] = t(model._apply_top_encoder(
            p, m, np.asarray(z_m))["embedding"])

    norm = (tm["m0"].float() + tm["m1"].float()).clamp(min=1.0)
    agg = (msgs["m0"] * tm["m0"].float()[:, None]
           + msgs["m1"] * tm["m1"].float()[:, None]) / norm[:, None]

    joint = model._apply_joint_encoder(p, np.asarray(agg))
    jmu, jlv = t(joint["embedding"]), t(joint["log_covariance"])
    joint_z = jmu

    z_recon_loss = 0
    for m in DIMS:
        zr = t(model._apply_top_decoder(p, m, np.asarray(joint_z)))
        lp = torch.distributions.Normal(zr, 1.0).log_prob(z1[m]).sum(-1)
        z_recon_loss = z_recon_loss + (-lp * GAMMAS[m]) * tm[m].float()

    joint_kld = -0.5 * torch.sum(1 + jlv - jmu.pow(2) - jlv.exp(), dim=-1)
    total = z_recon_loss + 1.2 * joint_kld + bottom_loss
    theirs = float(total.mean())
    assert ours == pytest.approx(theirs, rel=3e-4)


def test_cvae_loss_matches_torch_reference_math(monkeypatch):
    """CVAE parity (``cvae_model.py:136-180``): conditional ELBO with a
    learnable conditional prior, assembled in torch from OUR network
    outputs (deterministic via mean-z)."""
    import torch

    import multivae_tpu.models.cvae.cvae_model as cvae_mod
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import CVAE, CVAEConfig
    from multivae_tpu.models.base.step import StepInfo
    from multivae_tpu.nn import (
        BaseAEConfig,
        BaseDictEncoders,
        MultipleHeadJointEncoder,
    )

    monkeypatch.setattr(cvae_mod, "rsample_from_gaussian",
                        lambda rng, mu, lv, **kw: mu)

    prior_net = MultipleHeadJointEncoder(
        dict_encoders=BaseDictEncoders({"m1": DIMS["m1"]}, LATENT),
        args=BaseAEConfig(latent_dim=LATENT),
    )
    model = CVAE(CVAEConfig(
        main_modality="m0", conditioning_modalities=["m1"],
        input_dims=DIMS, latent_dim=LATENT, beta=1.4,
        decoder_dist="laplace",
    ), prior_network=prior_net, seed=0)
    rng = np.random.default_rng(8)
    B = 8
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])

    ours = float(model.loss_function(
        model.params, batch, jax.random.key(0), StepInfo.create(epoch=1)
    ).loss)

    # torch assembly from our network outputs
    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    p = model.params
    enc = model._apply_encoder(p, batch.data)
    mu, lv = t(enc["embedding"]), t(enc["log_covariance"])
    z = mu
    cond = {"m1": batch.data["m1"]}
    pri = model._apply_prior(p, cond)
    pmu, plv = t(pri["embedding"]), t(pri["log_covariance"])
    recon = t(model._apply_decoder(p, np.asarray(z), cond)["reconstruction"])
    x0 = torch.tensor(data["m0"])

    recon_loss = -torch.distributions.Laplace(recon, 1.0).log_prob(
        x0).mean(0).sum()
    kl = (0.5 * (plv - lv + (lv - plv).exp()
                 + (mu - pmu).pow(2) / plv.exp() - 1).sum(-1)).mean(0)
    theirs = float(recon_loss + kl * 1.4)
    assert ours == pytest.approx(theirs, rel=3e-4)


def test_telbo_both_stages_match_torch_reference_math(monkeypatch):
    """TELBO parity for stage 1 (joint ELBO with lambda factors) and
    stage 2 (unimodal ELBOs with gamma factors — including the reference's
    joint-log-var quirk in the KLD, ``telbo_model.py:118-121``)."""
    import torch

    import multivae_tpu.models.telbo.telbo_model as telbo_mod
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import TELBO, TELBOConfig
    from multivae_tpu.models.base.step import StepInfo

    monkeypatch.setattr(telbo_mod, "rsample_from_gaussian",
                        lambda rng, mu, lv, **kw: mu)

    model = TELBO(TELBOConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS, warmup=2,
        lambda_factors={"m0": 2.0, "m1": 0.5},
        gamma_factors={"m0": 1.5, "m1": 0.7},
        decoders_dist={m: "laplace" for m in DIMS},
    ), seed=0)
    rng = np.random.default_rng(9)
    B = 8
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])
    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    x = {m: torch.tensor(data[m]) for m in DIMS}
    p = model.params

    # ---- stage 1
    ours1 = float(model.loss_function(
        p, batch, jax.random.key(0), StepInfo.create(epoch=1)).loss)
    joint = model.apply_joint_encoder(p, batch.data)
    jmu, jlv = t(joint["embedding"]), t(joint["log_covariance"])
    recon_loss = 0
    for m, lam in [("m0", 2.0), ("m1", 0.5)]:
        r = t(model.decode_mod(p, m, np.asarray(jmu)))
        recon_loss = recon_loss + (
            -torch.distributions.Laplace(r.reshape(B, -1), 1.0).log_prob(
                x[m].reshape(B, -1)) * lam).sum()
    kld = -0.5 * torch.sum(1 + jlv - jmu.pow(2) - jlv.exp())
    assert ours1 == pytest.approx(float((recon_loss + kld) / B), rel=3e-4)

    # ---- stage 2
    model.set_stage(2)
    ours2 = float(model.loss_function(
        p, batch, jax.random.key(0), StepInfo.create(epoch=3)).loss)
    loss2 = 0
    for m, gam in [("m0", 1.5), ("m1", 0.7)]:
        out = model.encode_mod(p, m, batch.data[m])
        mmu, mlv = t(out["embedding"]), t(out["log_covariance"])
        r = t(model.decode_mod(p, m, np.asarray(mmu)))
        rec = (-torch.distributions.Laplace(r.reshape(B, -1), 1.0).log_prob(
            x[m].reshape(B, -1)) * gam).sum()
        # the reference quirk: joint log_var inside the unimodal KLD
        kld_m = -0.5 * torch.sum(1 + jlv - mmu.pow(2) - mlv.exp())
        loss2 = loss2 + rec + kld_m
    model.set_stage(1)
    assert ours2 == pytest.approx(float(loss2 / B), rel=3e-4)


def test_jmvae_loss_matches_torch_reference_math(monkeypatch):
    """JMVAE parity (``jmvae_model.py:116-190``): joint ELBO + alpha*LJM
    with warmup annealing — deterministic via mean-z."""
    import torch

    import multivae_tpu.models.jmvae.jmvae_model as jmvae_mod
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import JMVAE, JMVAEConfig
    from multivae_tpu.models.base.step import StepInfo

    monkeypatch.setattr(jmvae_mod, "rsample_from_gaussian",
                        lambda rng, mu, lv, **kw: mu)

    model = JMVAE(JMVAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        alpha=0.4, beta=1.2, warmup=4,
        decoders_dist={m: "laplace" for m in DIMS},
    ), seed=0)
    rng = np.random.default_rng(10)
    B = 8
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])
    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    x = {m: torch.tensor(data[m]) for m in DIMS}
    p = model.params

    for epoch, ann in [(2, 0.5), (6, 1.0)]:  # mid-warmup and after
        ours = float(model.loss_function(
            p, batch, jax.random.key(0), StepInfo.create(epoch=epoch)).loss)

        joint = model.apply_joint_encoder(p, batch.data)
        jmu, jlv = t(joint["embedding"]), t(joint["log_covariance"])
        recon_loss = 0
        for m in DIMS:
            r = t(model.decode_mod(p, m, np.asarray(jmu)))
            recon_loss = recon_loss - torch.distributions.Laplace(
                r.reshape(B, -1), 1.0).log_prob(x[m].reshape(B, -1)).sum()
        KLD = -0.5 * torch.sum(1 + jlv - jmu.pow(2) - jlv.exp()) * 1.2
        LJM = 0
        for m in DIMS:
            out = model.encode_mod(p, m, batch.data[m])
            umu, ulv = t(out["embedding"]), t(out["log_covariance"])
            LJM = LJM + 0.5 * (ulv - jlv
                               + (jlv.exp() + (jmu - umu) ** 2) / ulv.exp()
                               - 1)
        LJM = LJM.sum() * 0.4
        theirs = float((recon_loss + ann * (KLD + LJM)) / B)
        assert ours == pytest.approx(theirs, rel=3e-4), epoch


def test_mmvaePlus_iwae_looser_matches_torch_reference_math():
    """MMVAE+ parity (``mmvaePlus_model.py:230-363``): K-sample lws with
    shared u + private w latents, cross-modal reconstructions from the
    modality priors, masked MoE mixture on incomplete data — torch replica
    built from raw weights with the SAME fixed latent samples."""
    import math

    import torch

    from multivae_tpu.data import IncompleteDataset
    from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig
    from multivae_tpu.nn import (
        BaseAEConfig,
        Decoder_AE_MLP,
        Encoder_VAE_MLP_Style,
    )

    K, B, STYLE, BETA = 3, 8, 3, 1.3
    encoders = {
        m: Encoder_VAE_MLP_Style(
            BaseAEConfig(input_dim=d, latent_dim=LATENT, style_dim=STYLE),
            hidden_dim=HID)
        for m, d in DIMS.items()
    }
    decoders = {
        m: Decoder_AE_MLP(
            BaseAEConfig(input_dim=d, latent_dim=LATENT + STYLE),
            hidden_dim=HID)
        for m, d in DIMS.items()
    }
    model = MMVAEPlus(MMVAEPlusConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        K=K, beta=BETA, modalities_specific_dim=STYLE, loss="iwae_looser",
        prior_and_posterior_dist="laplace_with_softmax",
        decoders_dist={m: "laplace" for m in DIMS},
    ), encoders=encoders, decoders=decoders, seed=0)

    rng = np.random.default_rng(3)
    masks = {"m0": np.array([1, 1, 0, 1, 1, 0, 1, 1], bool),
             "m1": np.ones(B, bool)}
    data = {m: (rng.uniform(size=(B, *d)) * masks[m][:, None]).astype(
        np.float32) for m, d in DIMS.items()}
    ds = IncompleteDataset(data=data, masks=masks)
    batch = as_batch(ds[:])
    mods = list(DIMS)

    # fixed latent samples + fixed cross-modal prior draws for BOTH sides
    zs_np = {m: {"u": rng.normal(size=(K, B, LATENT)).astype(np.float32),
                 "w": rng.normal(size=(K, B, STYLE)).astype(np.float32)}
             for m in mods}
    cross_w_np = {m: rng.normal(size=(len(mods), K, B, STYLE)).astype(
        np.float32) for m in mods}

    # ---- ours: decode from the fixed latents, then the iwae_looser loss
    posteriors = model._posteriors(model.params, batch)
    zs_j = {m: {k: jnp.asarray(v) for k, v in zs_np[m].items()}
            for m in mods}
    cross_w_j = {m: jnp.asarray(v) for m, v in cross_w_np.items()}
    recons = model._decode_with_latents(model.params, zs_j, cross_w_j)
    ours = float(model._iwae_looser(
        model.params, batch, posteriors, zs_j, recons).loss)

    # ---- torch replica from raw weights (reference formulas)
    x = {m: torch.tensor(data[m]) for m in mods}
    tm = {m: torch.tensor(masks[m]) for m in mods}

    def enc(m):
        p = model.params["encoders"][m]
        W = {k: torch.tensor(np.asarray(p[k]["kernel"])) for k in p}
        b = {k: torch.tensor(np.asarray(p[k]["bias"])) for k in p}
        h = torch.relu(x[m].reshape(B, -1) @ W["Dense_0"] + b["Dense_0"])
        return tuple(h @ W[f"Dense_{i}"] + b[f"Dense_{i}"]
                     for i in (1, 2, 3, 4))

    def dec(m, z):
        p = model.params["decoders"][m]
        h = torch.relu(z @ torch.tensor(np.asarray(p["Dense_0"]["kernel"]))
                       + torch.tensor(np.asarray(p["Dense_0"]["bias"])))
        return torch.sigmoid(
            h @ torch.tensor(np.asarray(p["Dense_1"]["kernel"]))
            + torch.tensor(np.asarray(p["Dense_1"]["bias"])))

    def softmax_scale(lv):
        return torch.softmax(lv, dim=-1) * lv.shape[-1] + 1e-6

    qu, qw = {}, {}
    for m in mods:
        mu, lv, smu, slv = enc(m)
        qu[m] = torch.distributions.Laplace(mu, softmax_scale(lv))
        qw[m] = torch.distributions.Laplace(smu, softmax_scale(slv))
    # modality / shared priors: zero means, learnable zero log-vars
    prior_full = torch.distributions.Laplace(
        torch.zeros(LATENT + STYLE), torch.full((LATENT + STYLE,), 1 + 1e-6))

    n_mods_sample = (tm["m0"].float() + tm["m1"].float())
    tz = {m: {k: torch.tensor(v) for k, v in zs_np[m].items()} for m in mods}

    lws = []
    for i, m in enumerate(mods):
        u, w = tz[m]["u"], tz[m]["w"]
        lpz = prior_full.log_prob(torch.cat([u, w], dim=-1)).sum(-1)
        lq = []
        for mm in mods:
            lp = qu[mm].log_prob(u).sum(-1)
            lp = torch.where(tm[mm], lp, torch.tensor(-torch.inf))
            lq.append(lp)
        lqu = torch.logsumexp(torch.stack(lq), 0) - torch.log(n_mods_sample)
        lqw = qw[m].log_prob(w).sum(-1)
        lpx = 0
        for j, rm in enumerate(mods):
            w_dec = w if rm == m else torch.tensor(cross_w_np[rm][i])
            z = torch.cat([u, w_dec], dim=-1)
            recon = dec(rm, z.reshape(-1, LATENT + STYLE)).reshape(K, B, -1)
            lp = torch.distributions.Laplace(recon, 1.0).log_prob(
                x[rm].reshape(B, -1)).sum(-1)
            lpx = lpx + lp * tm[rm].float()
        lw = lpx + BETA * (lpz - lqu - lqw)
        lws.append(lw * tm[m].float())
    stacked = torch.stack(lws)                        # (M, K, B)
    k_est = torch.logsumexp(stacked, dim=1) - math.log(K)
    theirs = float(-(k_est.sum(0) / n_mods_sample).sum())

    assert ours == pytest.approx(theirs, rel=3e-4)


def test_mhvae_all_subset_loss_matches_torch_reference_math(monkeypatch):
    """MHVAE parity (``mhvae_model.py:90-262``): per-level PoE with prior
    expert and inf-log-var missing experts, hierarchical KLs, recon from
    z_1, averaged over all non-empty subsets — deterministic via mean-z,
    torch replica built from raw weights on incomplete data."""
    import torch

    import multivae_tpu.models.mhvae.mhvae_model as mhvae_mod
    from mhvae_test_architectures import build_mhvae_blocks
    from multivae_tpu.data import IncompleteDataset
    from multivae_tpu.models import MHVAE, MHVAEConfig
    from multivae_tpu.models.base.step import StepInfo

    monkeypatch.setattr(
        mhvae_mod, "rsample_from_gaussian",
        lambda rng, mu, lv, return_mean=False, **kw: mu)

    N_LATENT, LD, B, BETA = 3, 4, 8, 1.4
    enc, dec, bup, tdn, post, prior = build_mhvae_blocks(
        DIMS, n_latent=N_LATENT, latent_dim=LD, shared_posteriors=True)
    model = MHVAE(MHVAEConfig(
        n_modalities=2, latent_dim=LD, input_dims=DIMS, n_latent=N_LATENT,
        beta=BETA, decoders_dist={m: "laplace" for m in DIMS},
    ), encoders=enc, decoders=dec, bottom_up_blocks=bup,
        top_down_blocks=tdn, posterior_blocks=post, prior_blocks=prior,
        seed=0)

    rng = np.random.default_rng(7)
    masks = {"m0": np.array([1, 0, 1, 1, 1, 0, 1, 1], bool),
             "m1": np.ones(B, bool)}
    data = {m: (rng.uniform(size=(B, *d)) * masks[m][:, None]).astype(
        np.float32) for m, d in DIMS.items()}
    ds = IncompleteDataset(data=data, masks=masks)
    batch = as_batch(ds[:])
    model.init_params_with_batch(batch)
    p = model.params

    ours = float(model.loss_function(
        p, batch, jax.random.key(0), StepInfo.create(epoch=1)).loss)

    # ---- torch replica from raw weights
    x = {m: torch.tensor(data[m]) for m in DIMS}
    tm = {m: torch.tensor(masks[m]) for m in DIMS}

    def lin(block_p, name, h):
        return h @ torch.tensor(np.asarray(block_p[name]["kernel"])) + \
            torch.tensor(np.asarray(block_p[name]["bias"]))

    def head(block_p, h):
        """LatentHead / BottomUpLast: relu hidden + (mu, lv) heads."""
        hh = torch.relu(lin(block_p, "Dense_0", h))
        return lin(block_p, "Dense_1", hh), lin(block_p, "Dense_2", hh)

    # bottom-up: InputEncoder -> BottomUpMid -> BottomUpLast
    skips, zl = {}, {}
    for m in DIMS:
        h = torch.relu(lin(p["encoders"][m], "Dense_0",
                           x[m].reshape(B, -1)))
        mod_skips = [h]
        h = torch.relu(lin(p["bottom_up"][m]["0"], "Dense_0", h))
        mod_skips.append(h)
        zl[m] = head(p["bottom_up"][m]["1"], h)
        skips[m] = mod_skips

    def poe_t(mus, lvs):
        """Reference poe (``base_utils.py:122-130``): inf log-var experts
        contribute zero precision."""
        prec = torch.stack([torch.exp(-l) for l in lvs])
        var = 1.0 / prec.sum(0)
        mu = (torch.stack(mus) * prec).sum(0) * var
        return mu, torch.log(var)

    def kl_t(mu, lv, pmu, plv):
        return 0.5 * (plv - lv + (lv.exp() + (mu - pmu) ** 2) / plv.exp()
                      - 1).sum()

    def subset_loss(subset):
        mus, lvs = [], []
        for m in subset:
            lv = zl[m][1].clone()
            lv[~tm[m]] = torch.inf
            mus.append(zl[m][0])
            lvs.append(lv)
        mus.append(torch.zeros(B, LD))
        lvs.append(torch.zeros(B, LD))
        jmu, jlv = poe_t(mus, lvs)
        kl = kl_t(jmu, jlv, torch.zeros(B, LD), torch.zeros(B, LD))
        z = jmu  # mean-z
        for i in range(N_LATENT - 1, 0, -1):
            h = torch.relu(lin(p["top_down"][str(i - 1)], "Dense_0", z))
            pmu, plv = head(p["prior"][str(i - 1)], h)
            mus, lvs = [], []
            for m in subset:
                concat = torch.cat([h, skips[m][i - 1]], dim=-1)
                qmu, qlv = head(p["posterior"][str(i - 1)], concat)
                qlv = qlv.clone()
                qlv[~tm[m]] = torch.inf
                mus.append(qmu)
                lvs.append(qlv)
            mus.append(pmu)
            lvs.append(plv)
            lmu, llv = poe_t(mus, lvs)
            z = lmu
            kl = kl + kl_t(lmu, llv, pmu, plv)
        recon_loss = 0
        for m in DIMS:
            hh = torch.relu(lin(p["decoders"][m], "Dense_0", z))
            recon = lin(p["decoders"][m], "Dense_1", hh)
            lp = torch.distributions.Laplace(recon, 1.0).log_prob(
                x[m].reshape(B, -1)).sum(-1)
            recon_loss = recon_loss + (-lp * tm[m].float()).sum()
        return recon_loss + BETA * kl

    losses = [subset_loss(s) for s in [("m0",), ("m1",), ("m0", "m1")]]
    theirs = float(torch.stack(losses).mean())
    assert ours == pytest.approx(theirs, rel=3e-4)


def _torch_maf_forward(flow_params, z, latent_dim, hidden, n_hidden):
    """Torch replica of ops.flows.MAF.__call__ (density direction) from raw
    weights, with the MADE mask construction re-derived independently
    (Papamakarios et al. 2017 convention, as in pythae's MAF that the
    reference uses at ``jnf_model.py:73-78``)."""
    import torch

    degrees = [np.arange(1, latent_dim + 1)]
    for _ in range(n_hidden):
        degrees.append((np.arange(hidden) % (latent_dim - 1)) + 1
                       if latent_dim > 1 else np.ones(hidden, int))
    hidden_masks = [
        torch.tensor((d_out[None, :] >= d_in[:, None]).astype(np.float32))
        for d_in, d_out in zip(degrees[:-1], degrees[1:])
    ]
    out_mask = torch.tensor(
        (degrees[0][None, :] > degrees[-1][:, None]).astype(np.float32))

    u = z
    log_det = torch.zeros(z.shape[:-1])
    for b in sorted(flow_params.keys()):  # blocks_0, blocks_1, ...
        bp = flow_params[b]
        h = u
        for i, mask in enumerate(hidden_masks):
            lp = bp[f"hidden_{i}"]
            h = torch.relu(
                h @ (torch.tensor(np.asarray(lp["kernel"])) * mask)
                + torch.tensor(np.asarray(lp["bias"])))
        mu = h @ (torch.tensor(np.asarray(bp["mu"]["kernel"])) * out_mask) \
            + torch.tensor(np.asarray(bp["mu"]["bias"]))
        alpha = h @ (torch.tensor(np.asarray(bp["alpha"]["kernel"]))
                     * out_mask) \
            + torch.tensor(np.asarray(bp["alpha"]["bias"]))
        alpha = torch.tanh(alpha) * 3.0
        u = (u - mu) * torch.exp(-alpha)
        log_det = log_det - alpha.sum(-1)
        u = torch.flip(u, dims=(-1,))
    return u, log_det


def test_jnf_both_stages_match_torch_reference_math(monkeypatch):
    """JNF parity (``jnf_model.py:109-182``): stage-1 joint ELBO and the
    stage-2 L_JM flow objective, with the MAF density direction replicated
    in torch from raw weights — deterministic via mean-z."""
    import math

    import torch

    import multivae_tpu.models.jnf.jnf_model as jnf_mod
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import JNF, JNFConfig
    from multivae_tpu.models.base.step import StepInfo
    from multivae_tpu.ops.flows import MAF

    monkeypatch.setattr(jnf_mod, "rsample_from_gaussian",
                        lambda rng, mu, lv, **kw: mu)

    HIDDEN, NH = 16, 2
    flows = {m: MAF(input_dim=LATENT, n_made_blocks=2, hidden_size=HIDDEN,
                    n_hidden_in_made=NH) for m in DIMS}
    model = JNF(JNFConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        warmup=2, beta=1.6, decoders_dist={m: "laplace" for m in DIMS},
    ), flows=flows, seed=0)
    rng = np.random.default_rng(11)
    B = 8
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])
    p = model.params
    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    x = {m: torch.tensor(data[m]) for m in DIMS}

    joint = model.apply_joint_encoder(p, batch.data)
    jmu, jlv = t(joint["embedding"]), t(joint["log_covariance"])

    # ---- stage 1: joint ELBO
    ours1 = float(model.loss_function(
        p, batch, jax.random.key(0), StepInfo.create(epoch=1)).loss)
    recon_loss = 0
    for m in DIMS:
        r = t(model.decode_mod(p, m, np.asarray(jmu)))
        recon_loss = recon_loss - torch.distributions.Laplace(
            r.reshape(B, -1), 1.0).log_prob(x[m].reshape(B, -1)).sum()
    kld = -0.5 * torch.sum(1 + jlv - jmu.pow(2) - jlv.exp()) * 1.6
    assert ours1 == pytest.approx(float((recon_loss + kld) / B), rel=3e-4)

    # ---- stage 2: L_JM through the flows
    model.set_stage(2)
    ours2 = float(model.loss_function(
        p, batch, jax.random.key(0), StepInfo.create(epoch=3)).loss)
    model.set_stage(1)

    ljm = 0
    for m in DIMS:
        out = model.encode_mod(p, m, batch.data[m])
        mu0, lv0 = t(out["embedding"]), t(out["log_covariance"])
        z0, log_det = _torch_maf_forward(
            p["flows"][m], jmu, LATENT, HIDDEN, NH)
        log_q = (-0.5 * (lv0 + math.log(2 * math.pi)
                         + (z0 - mu0) ** 2 / lv0.exp())).sum(-1)
        ljm = ljm - (log_q + log_det).sum()
    assert ours2 == pytest.approx(float(ljm / B), rel=3e-4)


def test_jnf_poe_log_density_and_grad_match_torch_autograd():
    """The HMC target (``jnf_model.py:295-341``): PoE-of-flows log density
    and its z-gradient. Ours uses jax.grad of the flow density; the torch
    replica uses autograd through an independently-built MAF forward.
    This pins the leapfrog force term of the HMC subset sampler."""
    import math

    import torch

    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import JNF, JNFConfig
    from multivae_tpu.ops.flows import MAF

    HIDDEN, NH = 16, 2
    flows = {m: MAF(input_dim=LATENT, n_made_blocks=2, hidden_size=HIDDEN,
                    n_hidden_in_made=NH) for m in DIMS}
    model = JNF(JNFConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        decoders_dist={m: "laplace" for m in DIMS},
    ), flows=flows, seed=0)
    rng = np.random.default_rng(13)
    B = 8
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])
    p = model.params
    subset = ("m0", "m1")

    enc_params = {}
    for m in subset:
        out = model.encode_mod(p, m, batch.data[m])
        enc_params[m] = (out["embedding"], out["log_covariance"])

    z_np = rng.normal(size=(B, LATENT)).astype(np.float32)

    def ld(z):
        return model._poe_log_density(p, z, enc_params, subset,
                                      divide_prior=True)

    ours_val = np.asarray(ld(jnp.asarray(z_np)))
    ours_grad = np.asarray(jax.grad(lambda z: ld(z).sum())(
        jnp.asarray(z_np)))

    # ---- torch replica with autograd
    z = torch.tensor(z_np, requires_grad=True)
    lnqzs = (0.5 * (z ** 2 + math.log(2 * math.pi))).sum(-1)
    for m in subset:
        mu0 = torch.tensor(np.asarray(enc_params[m][0]))
        lv0 = torch.tensor(np.asarray(enc_params[m][1]))
        z0, log_det = _torch_maf_forward(
            p["flows"][m], z, LATENT, HIDDEN, NH)
        log_q = (-0.5 * (lv0 + math.log(2 * math.pi)
                         + (z0 - mu0) ** 2 / lv0.exp())).sum(-1)
        lnqzs = lnqzs + log_q + log_det
    g = torch.autograd.grad(lnqzs.sum(), z)[0]

    np.testing.assert_allclose(ours_val, lnqzs.detach().numpy(),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(ours_grad, g.numpy(), rtol=2e-3, atol=1e-5)


def test_jnf_hmc_subset_sampler_statistics():
    """End-to-end HMC statistics (``jnf_model.py:343-436``): with identity
    flows the PoE-of-flows target is an analytic Gaussian product; the HMC
    chain's empirical per-datapoint mean/std must match it."""
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import JNF, JNFConfig
    from multivae_tpu.ops.flows import MAF

    flows = {m: MAF(input_dim=LATENT, n_made_blocks=1, hidden_size=8,
                    n_hidden_in_made=1) for m in DIMS}
    model = JNF(JNFConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        decoders_dist={m: "laplace" for m in DIMS},
    ), flows=flows, seed=0)
    # zero flow weights -> identity flow (mu=0, alpha=tanh(0)*3=0)
    p = dict(model.params)
    p["flows"] = jax.tree.map(jnp.zeros_like, model.params["flows"])

    rng = np.random.default_rng(17)
    B = 2
    data = {m: rng.uniform(size=(B, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    batch = as_batch(ds[:])
    subset = ("m0", "m1")

    # analytic PoE target (divide_prior=False): precision-weighted product
    mus, precs = [], []
    for m in subset:
        out = model.encode_mod(p, m, batch.data[m])
        mus.append(np.asarray(out["embedding"]))
        precs.append(np.exp(-np.asarray(out["log_covariance"])))
    prec = sum(precs)
    target_mu = sum(m_ * pr for m_, pr in zip(mus, precs)) / prec
    target_std = prec ** -0.5

    K = 600
    z = model._sample_from_poe_subset(
        p, batch, subset, jax.random.key(0), mcmc_steps=250, n_lf=10,
        eps_lf=0.1, K=K, divide_prior=False)
    z = np.asarray(z)                       # (K, B, D)
    assert z.shape == (K, B, LATENT)
    emp_mu, emp_std = z.mean(0), z.std(0)
    np.testing.assert_allclose(emp_mu, target_mu, atol=0.2 * target_std.max())
    np.testing.assert_allclose(emp_std, target_std, rtol=0.3)
