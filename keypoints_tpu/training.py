"""Training core: model/optimizer construction and the jitted train step.

TPU-native realization of the reference's per-config train scripts (SURVEY.md
§2.1 "Train loop(s)", §3.1): one pure ``train_step`` — forward → loss → grad →
Adam update — compiled once by XLA. Warp-mode augmentation (TPS pair synthesis)
runs *inside* the step so the whole batch→update path is a single fused device
program with no host round-trips [B:5].

Data parallelism lives in ``parallel/dp.py`` and wraps the same step with
``shard_map`` + gradient pmean; this module is strategy-agnostic.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from keypoints_tpu.configs import Config
from keypoints_tpu.data.augment import WarpConfig, make_pair
from keypoints_tpu.losses import l2_loss
from keypoints_tpu.models import KeypointAutoencoder, Transporter


class TrainState(NamedTuple):
    """Minimal pytree train state: {step, params, opt_state}.

    No rng or data-iterator state is carried: the per-step rng is
    ``fold_in(PRNGKey(seed+2), step)`` and the data stream is indexed by
    ``step`` (train.make_batch_iterator), so both are pure functions of the
    seed and this counter — a checkpoint of this tuple alone gives
    bit-identical resume (SURVEY §5 checkpoint/resume)."""
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def build_model(cfg: Config) -> nn.Module:
    m = cfg.model
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[cfg.train.compute_dtype]
    cls = {"autoencoder": KeypointAutoencoder,
           "transporter": Transporter}[cfg.train.model_kind]
    return cls(num_keypoints=m.num_keypoints, out_channels=m.out_channels,
               sigma=m.sigma, temperature=m.temperature,
               softmax_variant=m.softmax_variant,
               encoder_filters=m.encoder_filters,
               encoder_strides=m.encoder_strides,
               decoder_filters=m.decoder_filters,
               decoder_upsample=m.decoder_upsample,
               groups=m.groups, dtype=dtype)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=t.lr, warmup_steps=t.warmup_steps,
        decay_steps=max(t.steps, t.warmup_steps + 1), end_value=t.lr * 0.1)
    if t.weight_decay > 0:
        return optax.adamw(sched, weight_decay=t.weight_decay)
    return optax.adam(sched)


def init_state(cfg: Config, rng: jax.Array) -> TrainState:
    model = build_model(cfg)
    s = cfg.data.image_size
    dummy = jnp.zeros((1, cfg.data.channels, s, s), jnp.float32)
    # jit the init: one fused compile instead of op-by-op dispatch (~100x
    # faster cold init on TPU, measured 90s -> ~1s for the pong64 model).
    params = jax.jit(model.init)(rng, dummy, dummy)["params"]
    tx = make_optimizer(cfg)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def warp_config(cfg: Config) -> WarpConfig:
    d = cfg.data
    return WarpConfig(tps_scale=d.tps_scale, rotate=d.rotate, scale=d.scale,
                      translate=d.translate, brightness=d.brightness,
                      contrast=d.contrast, saturation=d.saturation)


def make_loss_fn(cfg: Config, model: nn.Module,
                 loss: Optional[Callable] = None) -> Callable:
    """→ fn(params, src, tgt) -> (loss, aux dict). ``loss`` defaults to L2.

    ``train.keypoint_diversity`` > 0 adds an OPT-IN spatial-separation term
    (an extension beyond the published recipes — default 0.0 keeps exact
    golden-torch loss parity): a squared hinge on per-example pairwise
    keypoint distances, mean(relu(margin - d_ij)^2) over the K(K-1)/2
    pairs. Motivation is measured, not aesthetic: the round-4 3-seed study
    found a minority of inits converge to partial-discovery optima (pong64
    seed 0 parks all 4 keypoints near the ball and never finds the
    paddles — locking 0.557 at 10k steps vs 0.10/0.06 for its siblings;
    BASELINE.md "multi-seed quality study"). Pushing keypoints apart until
    they exceed ``train.diversity_margin`` makes that optimum unstable
    while leaving locked configurations (distances above the margin)
    untouched.
    """
    recon_loss = loss or l2_loss
    lam = cfg.train.keypoint_diversity
    margin = cfg.train.diversity_margin

    def loss_fn(params, src, tgt, lam_scale=1.0):
        recon, kp = model.apply({"params": params}, src, tgt)
        value = recon_loss(recon, tgt)
        aux = {"loss": value, "keypoints": kp, "recon": recon}
        if lam > 0.0:
            d = jnp.linalg.norm(
                kp[:, :, None] - kp[:, None] + 1e-12, axis=-1)
            k = kp.shape[1]
            # upper triangle only: each unordered pair once, no self-pairs
            mask = jnp.triu(jnp.ones((k, k), bool), 1)
            hinge = jnp.square(jnp.maximum(margin - d, 0.0))
            div = jnp.sum(jnp.where(mask, hinge, 0.0)) / (
                d.shape[0] * mask.sum())
            aux["diversity"] = div
            # lam_scale anneals the term (train.diversity_steps): full
            # strength early to destabilize collapsed basins, zero late so
            # the steady state optimizes the pure published objective —
            # a CONSTANT separation force displaces locked keypoints
            # (measured: pong64 seed 1 pck 0.64 → 0.01 under constant
            # λ=0.05/margin 0.5; see BASELINE.md round-4 A/B).
            value = value + (lam * lam_scale) * div
            aux["loss"] = value
        return value, aux
    return loss_fn


def make_train_step(cfg: Config, model: nn.Module, tx=None,
                    loss: Optional[Callable] = None,
                    axis_name: Optional[str] = None) -> Callable:
    """Build the pure train step: (state, batch, rng) → (state, metrics).

    ``batch`` is either a raw image batch (warp mode — the (src, tgt) pair is
    synthesized on device inside the step) or a precomputed (src, tgt) tuple
    (temporal mode). When ``axis_name`` is set the gradient is pmean'd across
    that mapped axis (the shard_map DP path).
    """
    tx = tx or make_optimizer(cfg)
    loss_fn = make_loss_fn(cfg, model, loss)
    warp_mode = cfg.data.pair_mode == "warp"
    wcfg = warp_config(cfg)

    bf16_aug = cfg.train.compute_dtype == "bfloat16"
    accum = cfg.train.grad_accum
    if accum < 1:
        raise ValueError(f"train.grad_accum must be >= 1, got {accum}")
    if accum > 1 and cfg.train.batch_size % accum != 0:
        raise ValueError(
            f"train.batch_size {cfg.train.batch_size} is not divisible by "
            f"train.grad_accum {accum}")

    div_anneal = (cfg.train.keypoint_diversity > 0.0
                  and cfg.train.diversity_steps > 0)

    def step(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if div_anneal:
            # linear decay to zero at diversity_steps (traced on step, so
            # resume reproduces the schedule exactly)
            scale = jnp.clip(1.0 - state.step.astype(jnp.float32)
                             / cfg.train.diversity_steps, 0.0, 1.0)
            lf = lambda p, s, t: loss_fn(p, s, t, scale)  # noqa: E731
        else:
            lf = loss_fn
        if warp_mode:
            if bf16_aug:
                # the model casts inputs to bf16 anyway; augmenting in bf16
                # halves the Pallas warp's gather/reduce traffic (positions
                # stay f32 inside the kernel — only pixel DATA narrows)
                batch = batch.astype(jnp.bfloat16)
            src, tgt = make_pair(rng, batch, wcfg)
        else:
            src, tgt = batch
        if accum > 1:
            # sequential micro-batches inside the step (lax.scan keeps
            # activation memory at one micro-batch): averaged micro-grads
            # equal the full-batch gradient exactly for mean losses, so
            # this is a pure memory/batch-size trade, not a different
            # optimization. Augmentation above still runs once on the full
            # batch — identical pairs to grad_accum=1.
            if src.shape[0] % accum != 0:   # per-shard batch under DP
                raise ValueError(
                    f"per-step batch {src.shape[0]} is not divisible by "
                    f"train.grad_accum {accum}")
            m = src.shape[0] // accum
            split = lambda x: x.reshape(accum, m, *x.shape[1:])  # noqa: E731

            def micro(carry, st):
                (v, _), g = jax.value_and_grad(lf, has_aux=True)(
                    state.params, *st)
                cv, cg = carry
                return (cv + v, jax.tree_util.tree_map(jnp.add, cg, g)), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (value, grads), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), zeros),
                (split(src), split(tgt)))
            value = value / accum
            grads = jax.tree_util.tree_map(lambda x: x / accum, grads)
        else:
            (value, aux), grads = jax.value_and_grad(lf, has_aux=True)(
                state.params, src, tgt)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            value = jax.lax.pmean(value, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": value,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state), metrics

    return step


def make_extract_fn(cfg: Config, model: nn.Module) -> Callable:
    """Jittable keypoint-extraction path: (params, images) → (B, K, 2) [B:2]."""
    def extract(params, images):
        return model.apply({"params": params}, images,
                           method=model.extract_keypoints)
    return extract


def make_extract_many_fn(cfg: Config, model: nn.Module) -> Callable:
    """Bulk extraction: (params, (N, B, C, H, W)) → (N, B, K, 2) in ONE
    device dispatch (``lax.map`` over pre-loaded batches).

    Through the remote-TPU tunnel every dispatch costs ~1.4 ms of host
    round-trip that the per-batch path pays per 8.2 ms of device work
    (DESIGN.md extract accounting: 9.65 ms wall vs 8.20 device). Bulk
    dataset labeling — the [B:2] extract use case — amortizes it to one
    round-trip per N batches. Batches beyond the saturation batch (1024)
    belong in N, not B: the per-batch program keeps its measured-optimal
    working set while N only adds sequential iterations.
    """
    extract = make_extract_fn(cfg, model)

    def extract_many(params, images):
        return jax.lax.map(lambda im: extract(params, im), images)
    return extract_many
