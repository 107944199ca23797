"""Optimizers & schedules.

TPU-native equivalent of the reference's optimization stack
(reference: madrigal/utils.py:446-694): five independent learning rates
(structure / kg / perturb+tx / fusion / decoder) with decay vs no-decay
parameter grouping via optax.multi_transform; LARS (moco-v3 style,
utils.py:628-662); linear-warmup + cosine-decay schedules
(utils.py:665-694).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizerConfig

# modules whose params never get weight decay, mirroring the reference's
# get_parameter_names exclusions (utils.py:446-498): LayerNorm params,
# biases, and the cls / bottleneck token parameters
NO_DECAY_LEAF_NAMES = {"bias"}
NO_DECAY_PARAM_NAMES = {
    "cls", "tx_bottleneck_tokens", "x_attn_query", "eps", "pe",
}
LN_MODULE_HINTS = ("norm1", "norm2", "x_attn_kv_norm", "x_attn_query_norm")


def _group_of(path: tuple) -> str:
    """Map a parameter path to its LR group (utils.py:473-479)."""
    parts = [str(p) for p in path]
    joined = "/".join(parts)
    if "str_encoder" in parts:
        return "str"
    if "kg_encoder" in parts:
        return "kg"
    if (
        "cv_encoder" in parts
        or "tx_encoder" in parts
        or any(p.startswith("tab_encoder_") for p in parts)
    ):
        return "perturb"
    if "decoder" == parts[0] or (len(parts) > 1 and parts[0] == "decoder"):
        return "decoder"
    # fusion: transformer, pos_encoder, projectors, cls/bottlenecks and
    # anything else inside the encoder
    return "fusion"


def _is_no_decay(path: tuple) -> bool:
    parts = [str(p) for p in path]
    leaf = parts[-1]
    if leaf in NO_DECAY_LEAF_NAMES or leaf in NO_DECAY_PARAM_NAMES:
        return True
    # LayerNorm scale params (flax names them 'scale'); BatchNorm scale is
    # decayed in the reference (only nn.LayerNorm excluded, utils.py:470)
    if leaf == "scale" and any(
        h in p for p in parts for h in LN_MODULE_HINTS + ("norm_",)
    ):
        # MLPEncoder 'norm_{i}' may be LN or BN; LN-only exclusion requires
        # the module config -- we exclude both, a deliberate simplification
        # (BN scales are tiny in count; excluding them from decay is the
        # conventional choice).
        return True
    return False


def param_labels(params) -> Any:
    """Label tree: '<group>', '<group>_nd' (no decay), or 'frozen'. The
    decoder keeps a single decayed group like the reference
    (utils.py:591-599); the chemCPA drug_embeddings table holds frozen
    rdkit2D descriptors in the reference (chemCPA/embedding.py:10-20) and
    is excluded from every optimizer."""

    def label(path, _):
        keys = tuple(k.key for k in path)
        if "drug_embeddings" in keys and "tx_encoder" in keys:
            return "frozen"
        g = _group_of(keys)
        if g == "decoder":
            return "decoder"
        return g + ("_nd" if _is_no_decay(keys) else "")

    return jax.tree_util.tree_map_with_path(label, params)


def warmup_cosine_schedule(
    base_lr: float, warmup_epochs: int, total_epochs: int,
    num_cycles: float = 1.0,
) -> Callable:
    """LinearWarmupCosineDecaySchedule (utils.py:665-679): linear 0->base
    over warmup, then base * (1 + cos(pi * cycles * t)) / 2."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_epochs, 1)
        t = (step - warmup_epochs) / max(total_epochs - warmup_epochs, 1)
        cos = base_lr * (1.0 + jnp.cos(jnp.pi * num_cycles * t)) / 2.0
        return jnp.where(step < warmup_epochs, warm, cos)

    return sched


def half_cycle_cosine_schedule(
    base_lr: float, warmup_epochs: int, total_epochs: int
) -> Callable:
    """Pretrain per-epoch adjust_learning_rate (utils.py:682-694)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_epochs, 1)
        t = (step - warmup_epochs) / max(total_epochs - warmup_epochs, 1)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_epochs, warm, cos)

    return sched


def lars(
    learning_rate, weight_decay: float = 0.0, momentum: float = 0.9,
    trust_coefficient: float = 0.001,
) -> optax.GradientTransformation:
    """LARS exactly as the reference's moco-v3 copy (utils.py:628-662):
    layer-adaptive rate scaling + heavy-ball momentum; params with ndim<=1
    get neither rate scaling nor weight decay."""

    def init(params):
        return {
            "mu": jax.tree_util.tree_map(jnp.zeros_like, params),
            "count": jnp.zeros([], jnp.int32),
        }

    def update(grads, state, params):
        count = state["count"]
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def upd(g, p, mu):
            dp = g
            if p.ndim > 1:
                dp = dp + weight_decay * p
                p_norm = jnp.linalg.norm(p)
                g_norm = jnp.linalg.norm(dp)
                q = jnp.where(
                    p_norm > 0.0,
                    jnp.where(
                        g_norm > 0.0, trust_coefficient * p_norm / g_norm, 1.0
                    ),
                    1.0,
                )
                dp = dp * q
            new_mu = momentum * mu + dp
            return -lr * new_mu, new_mu

        flat = jax.tree_util.tree_map(upd, grads, params, state["mu"])
        updates = jax.tree_util.tree_map(lambda t: t[0], flat,
                                         is_leaf=lambda x: isinstance(x, tuple))
        new_mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                        is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"mu": new_mu, "count": count + 1}

    return optax.GradientTransformation(init, update)


def _adamw(lr_fn, cfg: OptimizerConfig, wd: float):
    if cfg.optimizer == "adamw":
        return optax.adamw(
            learning_rate=lr_fn, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
            weight_decay=wd,
        )
    if cfg.optimizer == "radam":
        base = optax.radam(
            learning_rate=lr_fn, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
        )
        if wd:
            return optax.chain(optax.add_decayed_weights(wd), base)
        return base
    if cfg.optimizer == "lars":
        return lars(lr_fn, weight_decay=wd, momentum=cfg.momentum)
    raise NotImplementedError(cfg.optimizer)


def create_optimizer(
    params,
    cfg: OptimizerConfig,
    warmup_epochs: int = 0,
    total_epochs: int = 1,
    frozen_encoder: bool = False,
) -> optax.GradientTransformation:
    """Multi-LR grouped optimizer (utils.py:463-613). One optimizer step ==
    one epoch in full-batch training, so schedules step per epoch exactly
    like the reference's scheduler.step().

    frozen_encoder: train the decoder only -- every encoder group's update
    is zeroed (the reference's --frozen / requires_grad=False over encoder
    params, utils.py:329-331)."""
    group_lrs = {
        "str": cfg.structure_encoder_lr,
        "kg": cfg.kg_encoder_lr,
        "perturb": cfg.perturb_encoders_lr,
        "fusion": cfg.fusion_lr,
        "decoder": cfg.decoder_lr,
    }

    def sched_for(lr):
        if warmup_epochs > 0:
            return warmup_cosine_schedule(lr, warmup_epochs, total_epochs)
        return lr

    transforms: Dict[str, optax.GradientTransformation] = {}
    for g, lr in group_lrs.items():
        if frozen_encoder and g != "decoder":
            transforms[g] = optax.set_to_zero()
            transforms[g + "_nd"] = optax.set_to_zero()
            continue
        transforms[g] = _adamw(sched_for(lr), cfg, cfg.wd)
        if g != "decoder":
            transforms[g + "_nd"] = _adamw(sched_for(lr), cfg, 0.0)
    transforms["frozen"] = optax.set_to_zero()

    labels = param_labels(params)
    return optax.multi_transform(transforms, labels)
