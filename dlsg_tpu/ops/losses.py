"""Loss functions.

- masked cross-entropy: dense-mask equivalent of the reference's per-sample
  truncate-and-concat CE (`run_gun.py:189-197`) — mean of -log p(target) over
  the first `cap_len` positions of every sample.
- WGAN-GP: discriminator loss `mean(f) - mean(r) + 10*gp` with the gradient
  penalty computed via `jax.grad` through the discriminator
  (`run_gun.py:339-383`). The reference must disable cuDNN to make this
  double-backward work (train_debug.py:51); JAX handles grad-of-grad natively.
- generator adversarial loss: `-mean(D(fake))` (`run_gun.py:219`).
- psl diversity margin loss (`run_gun.py:322-336`, defined-but-unused in the
  reference; kept for capability parity).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] float mask (1 where position < length)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def masked_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, lengths: jnp.ndarray
) -> jnp.ndarray:
    """Mean CE over valid (non-pad) positions.

    Equivalent to `nn.CrossEntropyLoss()(cat_j(logits[j,:len_j]),
    cat_j(targets[j,:len_j]))` from run_gun.py:189-197, but with a dense mask —
    no ragged host-side concatenation, fully jittable.
    """
    T = targets.shape[1]
    mask = length_mask(lengths, T)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]  # [B, T]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def to_onehot(seq: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """[B, T] int -> [B, T, V] one-hot (run_gun.py:449-453; pad id included,
    matching the reference's scatter)."""
    return jax.nn.one_hot(seq, vocab_size, dtype=jnp.float32)


def gradient_penalty(
    d_fn: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    eps: jnp.ndarray,
) -> jnp.ndarray:
    """WGAN-GP penalty: E[(||∇_x D(x_mix)||_2 - 1)^2] (run_gun.py:355-371).

    Args:
      d_fn: captions [B, T, V] -> per-sample logits [B].
      real/fake: caption distributions [B, T, V].
      eps: per-sample mixing coefficients [B, 1, 1] ~ U[0, 1].
    """
    mixed = real * eps + fake * (1.0 - eps)
    # grad_outputs=ones <=> gradient of sum(D(mixed)) w.r.t. mixed
    grads = jax.grad(lambda m: jnp.sum(d_fn(m)))(mixed)
    # accumulate the norm in fp32 (grads may be bf16 under bf16 compute;
    # a bf16 sum over ~260k squares loses the norm entirely)
    grads = grads.reshape(grads.shape[0], -1).astype(jnp.float32)
    norm = jnp.linalg.norm(grads, axis=1)
    return jnp.mean((norm - 1.0) ** 2)


def make_gradient_penalty_rof(apply_fn: Callable):
    """Gradient penalty with a custom VJP that computes the parameter
    gradient as reverse-over-FORWARD instead of reverse-over-reverse.

    Exact math, not an approximation: gp = f(g(θ)) with g = ∇_x Σ D(x;θ), so
    dgp/dθ = u·(∂g/∂θ) with u = ∂f/∂g evaluated at the primal — and
    u·∂g/∂θ = ∇_θ [u·g] = ∇_θ [jvp of Σ D at mixed in direction u]
    (the classic Hessian-vector-product-as-grad-of-jvp identity). The default
    autodiff path instead differentiates through the inner backward graph
    (reverse-over-reverse), which re-traverses the discriminator trunk;
    whether grad-of-jvp schedules better on TPU is measured in
    scripts/ab_dphase_r4.py.

    apply_fn(dparams, caps) -> per-sample logits [B].
    Returns gp(dparams, mixed) -> scalar. NOTE: the cotangent w.r.t. `mixed`
    is ZERO by construction — callers must only use this where the mixed
    input is detached (true in the D substep: real/fake are stop-gradient'd,
    run_gun.py:355-371 likewise only backprops the penalty into D's params).
    """

    @jax.custom_vjp
    def gp(dparams, mixed):
        g = jax.grad(lambda m: jnp.sum(apply_fn(dparams, m)))(mixed)
        gn = g.reshape(g.shape[0], -1).astype(jnp.float32)  # fp32 norm accum
        norm = jnp.linalg.norm(gn, axis=1)
        return jnp.mean((norm - 1.0) ** 2)

    def fwd(dparams, mixed):
        g = jax.grad(lambda m: jnp.sum(apply_fn(dparams, m)))(mixed)
        B = g.shape[0]
        gn = g.reshape(B, -1).astype(jnp.float32)  # fp32 norm accum
        norm = jnp.linalg.norm(gn, axis=1)
        val = jnp.mean((norm - 1.0) ** 2)
        # u = d(gp)/d(g): (2/B) * (norm-1)/norm * g, rowwise; cast back to
        # the primal dtype (jvp requires tangent dtype == primal dtype)
        coef = (2.0 / B) * (norm - 1.0) / jnp.maximum(norm, 1e-12)
        u = (coef[:, None] * gn).reshape(g.shape).astype(g.dtype)
        return val, (dparams, mixed, u)

    def bwd(res, cot):
        dparams, mixed, u = res

        def hvp_dir(p):
            # u · ∇_x Σ D(x;p) = d/dε Σ D(mixed + ε·u; p)
            _, tangent = jax.jvp(lambda m: jnp.sum(apply_fn(p, m)), (mixed,), (u,))
            return tangent

        gp_grad = jax.grad(hvp_dir)(dparams)
        gp_grad = jax.tree_util.tree_map(lambda x: x * cot, gp_grad)
        return gp_grad, jnp.zeros_like(mixed)

    gp.defvjp(fwd, bwd)
    return gp


# WGAN-GP gradient-penalty weight (run_gun.py:372-375) — the single source
# for every D-loss site (wgan_d_loss, wgan_d_loss_fused, train/steps.py).
GP_WEIGHT = 10.0


def wgan_d_loss(
    d_fn: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    eps: jnp.ndarray,
    gp_weight: float = GP_WEIGHT,
):
    """Discriminator loss f - r + 10*gp (run_gun.py:372-375).

    Returns (loss, aux) with aux = dict(wasserstein=r - f, gp=gp).
    """
    r_logit = d_fn(real)
    f_logit = d_fn(fake)
    gp = gradient_penalty(d_fn, real, fake, eps)
    r_loss = jnp.mean(r_logit)
    f_loss = jnp.mean(f_logit)
    loss = f_loss - r_loss + gp_weight * gp
    return loss, {"wasserstein": r_loss - f_loss, "gp": gp}


def wgan_d_loss_fused(
    d_fn3: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    eps: jnp.ndarray,
    gp_weight: float = GP_WEIGHT,
):
    """`wgan_d_loss` in ONE discriminator traversal over [real|fake|interp].

    The D substep was latency-bound on op count (~5,400 device ops per substep
    from three separate discriminator applications, each with a 26-step LSTM
    scan — BENCHMARKS.md train trace). `d_fn3` scores the three stacked
    sub-batches in one pass (DiscV2 groups=3: the trunk is row-independent and
    the batch-mean quirk applies per sub-batch), so scores of one group carry
    no dependence on the others' rows, and the vjp cotangent selecting the
    interp rows yields exactly `grad of sum(D(interp))` — the same gradient
    penalty as `gradient_penalty` (run_gun.py:355-371).

    Returns (loss, aux) identical in value to `wgan_d_loss`.
    """
    B = real.shape[0]
    mixed = real * eps + fake * (1.0 - eps)
    caps = jnp.concatenate([real, fake, mixed], axis=0)
    scores, vjp = jax.vjp(d_fn3, caps)
    r_loss = jnp.mean(scores[:B])
    f_loss = jnp.mean(scores[B : 2 * B])
    cot = jnp.zeros_like(scores).at[2 * B :].set(1.0)
    (gcaps,) = vjp(cot)
    grads = gcaps[2 * B :].reshape(B, -1).astype(jnp.float32)  # fp32 norm accum
    norm = jnp.linalg.norm(grads, axis=1)
    gp = jnp.mean((norm - 1.0) ** 2)
    loss = f_loss - r_loss + gp_weight * gp
    return loss, {"wasserstein": r_loss - f_loss, "gp": gp}


def wgan_g_loss(f_logit: jnp.ndarray) -> jnp.ndarray:
    """Generator adversarial loss: -mean(D(fake)) (run_gun.py:219)."""
    return -jnp.mean(f_logit)


def psl_diversity_loss(psl: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Cosine-embedding margin loss over all unordered proposal pairs, target=-1,
    scaled by 0.5 (run_gun.py:322-336; unused by the reference training loop)."""
    x = psl / (jnp.linalg.norm(psl, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("bpd,bqd->bpq", x, x)  # [B, P, P]
    P = psl.shape[1]
    iu = jnp.triu(jnp.ones((P, P), bool), k=1)
    pair_loss = jnp.maximum(sim - margin, 0.0)
    return 0.5 * jnp.sum(pair_loss * iu) / (psl.shape[0] * jnp.sum(iu))
