"""Gaussian aggregation kernels: KL, Product-of-Experts, reparameterized sampling.

TPU-native re-design of the reference ops layer
(``src/multivae/models/base/base_utils.py:90-172``). Key difference from the
reference: missing modalities are expressed as *multiplicative precision
masks* (mask * exp(-log_var)) instead of setting ``log_var = +inf``
(reference ``src/multivae/models/mvtcae/mvtcae_model.py:128-130``). This is
mathematically identical (an infinite-variance expert has zero precision),
avoids inf/nan arithmetic that XLA gradients choke on, fuses into one
elementwise kernel, and keeps the property that missing modalities' encoders
receive exactly zero gradient.

All functions are pure and shape-polymorphic (jit/vmap/scan friendly).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def kl_divergence(mean, log_var, prior_mean, prior_log_var):
    """Closed-form KL between two diagonal Gaussians, summed over last dim.

    KL(N(mean, e^log_var) || N(prior_mean, e^prior_log_var)).
    Reference: ``src/multivae/models/base/base_utils.py:90-119``.
    """
    kl = 0.5 * (
        prior_log_var
        - log_var
        + jnp.exp(log_var - prior_log_var)
        + (mean - prior_mean) ** 2 / jnp.exp(prior_log_var)
        - 1.0
    )
    return kl.sum(axis=-1, dtype=jnp.float32)


def gaussian_log_prob(x, mean, log_var):
    """Elementwise log N(x; mean, exp(log_var)) (diagonal)."""
    return -0.5 * (_LOG_2PI + log_var + (x - mean) ** 2 * jnp.exp(-log_var))


def poe(mus, log_vars, eps: float = 1e-8):
    """Product of Gaussian experts along the leading axis.

    Args:
        mus: (M, ..., D) expert means.
        log_vars: (M, ..., D) expert log-variances.
        eps: added to variances for numerical stability, matching the
            reference exactly (``base_utils.py:122-130``).

    Returns:
        (joint_mu, joint_log_var) with shape (..., D).
    """
    var = jnp.exp(log_vars) + eps
    precision = 1.0 / var
    total_precision = jnp.sum(precision, axis=0)
    joint_mu = jnp.sum(mus * precision, axis=0) / total_precision
    joint_log_var = -jnp.log(total_precision)
    return joint_mu, joint_log_var


def masked_poe(mus, log_vars, mask=None, prior_expert: bool = False,
               eps: float = 1e-8):
    """Masked Product of Gaussian experts along the leading axis.

    Missing experts (mask == 0) contribute zero precision, which is exactly
    the reference's ``log_var = +inf`` convention
    (``mvtcae_model.py:128-130``, ``mvae_model.py:67-69``) but numerically
    safe: no inf enters any computation and the gradient w.r.t. a masked
    expert's (mu, log_var) is identically zero.

    Args:
        mus: (M, B, D) expert means.
        log_vars: (M, B, D) expert log-variances.
        mask: (M, B) float availability mask, or None (all available).
        prior_expert: include a standard-normal expert N(0, I) in the
            product (used by MVAE/DMVAE, reference ``mvae_model.py:62-66``).
        eps: variance floor matching reference ``poe``.

    Returns:
        (joint_mu, joint_log_var) of shape (B, D).
    """
    # NOTE on overflow: exp overflows to inf at log_var >~ 88 in f32
    # and 1/inf then has a NaN *backward* (inf/inf) — exactly the
    # reference's torch semantics, surfaced to the trainer's NaN guard.
    # Do NOT "harden" this with a clip/minimum on the exp argument:
    # even a single extra pointwise op here perturbs XLA/LLVM fusion
    # enough to flip last-bit reduction rounding between the host-loader
    # and cached-scan programs and break the MVTCAE bit-identity pins
    # (measured r4: jnp.clip AND jnp.minimum both break
    # test_cached_training_identical_to_host_loader; the value-backstop
    # compare below does not). Precision UNDERFLOW (finite exp, tiny or
    # flushed-to-zero precision) is handled by the dead-row backstop
    # below with finite gradients.
    precision = 1.0 / (jnp.exp(log_vars) + eps)
    if mask is not None:
        # broadcast over ALL trailing dims (latents may be conv feature
        # maps, e.g. MHVAE's intermediate levels)
        mask = jnp.reshape(
            mask, mask.shape + (1,) * (precision.ndim - jnp.ndim(mask))
        )
        precision = precision * mask
    total_precision = jnp.sum(precision, axis=0)
    weighted_mu = jnp.sum(mus * precision, axis=0)
    if prior_expert:
        total_precision = total_precision + 1.0 / (1.0 + eps)
        # prior mean is zero: no contribution to weighted_mu
    # Guard: if every expert is masked out and there is no prior expert the
    # posterior is undefined. Fall back to the prior N(0, I) for those rows
    # (possible on incomplete data where a sample has NO available
    # modality): the former 1e-20-precision clamp produced log_var ~ +46,
    # whose exp(23)-scale samples overflow decoder intermediates and turn
    # the WHOLE batch's gradient to NaN in the backward pass even under
    # zero cotangents. Rows with >= 1 live expert are bit-identical.
    if mask is not None and not prior_expert:
        # Add the fallback precision 1.0 (the prior) ONLY on all-dead
        # rows. Formulated as an add of a stop-gradient'd 0/1 term
        # rather than a where-select on the value path: ``x + 0.0`` is
        # bit-transparent for live rows regardless of fusion and leaves
        # no select on the backward cotangent path (a select here
        # perturbed XLA/LLVM fusion enough to break the host-vs-cached
        # bit-identity pins on the CPU test backend).
        # Dead = no unmasked expert (the > 0 compare also keeps rows
        # with FRACTIONAL availability weights in (0, 1) untouched) OR
        # total precision at/below the 1e-20 clamp floor — a "live" row
        # whose expert variances all diverged toward the f32
        # exp-overflow point has a tiny (or TPU flushed-to-zero) total
        # precision, and without the value backstop it would fall
        # through to the clamp and resurface the log_var ~ +46
        # sampling-overflow hazard described above. The threshold MUST
        # match the clamp: an earlier 1e-30 threshold left the
        # [1e-30, 1e-20) band (expert log_var in +46..+69) exposed to
        # exactly that hazard. 1e-20 total precision is log_var = +46:
        # any healthy posterior is many orders above it.
        alive = jnp.max(mask, axis=0) > 0  # mask is broadcast-shaped
        dead = jnp.logical_or(
            jnp.logical_not(alive),
            jax.lax.stop_gradient(total_precision) <= 1e-20,
        )
        total_precision = total_precision + dead.astype(
            total_precision.dtype)
    safe_precision = jnp.maximum(total_precision, 1e-20)
    joint_mu = weighted_mu / safe_precision
    joint_log_var = -jnp.log(safe_precision)
    return joint_mu, joint_log_var


def stable_poe(mus, log_vars, mask=None):
    """Log-sum-exp-stabilized Product of Experts.

    Reference: ``src/multivae/models/base/base_utils.py:133-147``. The joint
    log-variance is computed as -logsumexp(-log_vars) which is stable for
    very small/large variances. Masking uses the where-guarded logsumexp
    trick so gradients to masked experts are exactly zero.

    Args:
        mus: (M, ..., D); log_vars: (M, ..., D); mask: (M, ...) or None.
    """
    mus = jnp.asarray(mus)
    log_vars = jnp.asarray(log_vars)
    if mask is None and mus.shape[0] == 1:
        return mus[0], log_vars[0]

    ln_inv_vars = -log_vars
    if mask is not None:
        neg_fill = jnp.full_like(ln_inv_vars, -1e30)
        ln_inv_vars = jnp.where(mask[..., None] > 0, ln_inv_vars, neg_fill)
    ln_var = -jax.nn.logsumexp(ln_inv_vars, axis=0)
    weights = jnp.exp(ln_inv_vars + ln_var)  # normalized precisions
    joint_mu = jnp.sum(weights * mus, axis=0)
    if mask is not None:
        # rows where EVERY expert is masked fall back to the prior
        # N(0, I) (see ``masked_poe``): otherwise ln_var ~ +1e30 and the
        # exp() downstream (sampling std, KL) overflows to inf, whose
        # backward poisons the whole batch's gradient with NaN. Callers
        # that append an always-on prior expert (MVAE, DMVAE) never hit
        # this branch and are unchanged.
        any_avail = jnp.max(mask, axis=0) > 0
        joint_mu = jnp.where(any_avail[..., None], joint_mu, 0.0)
        ln_var = jnp.where(any_avail[..., None], ln_var, 0.0)
    return joint_mu, ln_var


def rsample_from_gaussian(rng, mu, log_var, N: int = 1, return_mean: bool = False,
                          flatten: bool = False):
    """Reparameterized sampling from a diagonal Gaussian.

    Matches reference semantics (``base_utils.py:150-172``): with N == 1 the
    output has the shape of ``mu``; with N > 1 a leading sample axis is
    prepended; ``flatten`` merges the (N, batch) axes.

    Args:
        rng: a ``jax.random`` key (ignored when return_mean).
        mu, log_var: (..., D) posterior parameters.
        N: number of samples.
        return_mean: return the mean (replicated N times) instead of samples.
    """
    if N == 1:
        shape = mu.shape
    else:
        shape = (N, *mu.shape)

    if return_mean:
        z = jnp.broadcast_to(mu, shape)
    else:
        noise = jax.random.normal(rng, shape, dtype=mu.dtype)
        z = mu + jnp.exp(0.5 * log_var) * noise

    if N > 1 and flatten:
        if z.ndim == 2:  # (N, D) -> treat batch of 1, reference :168-170
            z = z[:, None, :]
        z = z.reshape(-1, *z.shape[2:])
    return z
