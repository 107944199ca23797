"""Checkpointing with embedded configs.

Mirrors the reference's checkpoint formats (reference: pretrain.py:230-236
{epoch, state_dict, optimizer, encoder_configs}; train_ddi_batch.py:393-412
{epoch, state_dict, encoder_configs, model_configs}) using orbax: models are
reconstructable purely from the embedded config dicts (predict.py:20-23).

Also implements the CL->finetune transfer filter
(reference: madrigal/utils.py:246-307): keep encoder weights, drop
fusion / pos-encoder / CLS / bottlenecks (and optionally the uni projector).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .. import config as config_lib


def save_checkpoint(
    path: str,
    params: dict,
    batch_stats: dict,
    cfg: Any,
    epoch: int,
    opt_state: Any = None,
    extra: Optional[dict] = None,
):
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = {
        "params": params,
        "batch_stats": batch_stats,
    }
    if opt_state is not None:
        tree["opt_state"] = opt_state
    ckptr.save(path, tree, force=True)
    meta = {
        "epoch": int(epoch),
        "config_class": type(cfg).__name__,
        "config": config_lib.to_dict(cfg),
        "extra": extra or {},
    }
    with open(os.path.join(path, "madrigal_meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str):
    """Returns (tree, meta) with cfg rebuilt from the embedded config."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    with open(os.path.join(path, "madrigal_meta.json")) as f:
        meta = json.load(f)
    cls = getattr(config_lib, meta["config_class"])
    meta["cfg"] = config_lib.from_dict(cls, meta["config"])
    return tree, meta


# ---------------------------------------------------------------------------
# CL -> finetune transfer (utils.py:246-307)
# ---------------------------------------------------------------------------

CL_TRANSFER_DROP_TOP = ("transformer", "pos_encoder", "cls",
                        "tx_bottleneck_tokens")


def filter_cl_params_for_finetune(
    encoder_params: dict, use_pretrained_adaptor: bool = False
) -> dict:
    """Keep modality-encoder weights; drop fusion-related modules so the
    finetune stage re-initializes them (reference utils.py:281-296)."""
    out = {}
    for k, v in encoder_params.items():
        if k in CL_TRANSFER_DROP_TOP:
            continue
        if k == "uni_projector" and not use_pretrained_adaptor:
            continue
        out[k] = v
    return out


def merge_params(init_params: dict, loaded: dict) -> dict:
    """Overlay loaded subtrees onto freshly-initialized params (strict on
    shape mismatches; missing keys keep their fresh init)."""
    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            for k, v in b.items():
                out[k] = merge(a[k], v) if k in a else v
            return out
        bv = np.asarray(b)
        av = np.asarray(a)
        if av.shape != bv.shape:
            raise ValueError(f"shape mismatch: {av.shape} vs {bv.shape}")
        return b

    return merge(init_params, loaded)


class EarlyStopping:
    """Patience-based early stopping on a maximized score
    (reference: chemCPA/model.py:714-727)."""

    def __init__(self, patience: int = 5):
        self.patience = patience
        self.best_score = -1e3
        self.trials = 0

    def __call__(self, score: Optional[float]) -> bool:
        if score is None:
            return False
        if score > self.best_score:
            self.best_score = score
            self.trials = 0
        else:
            self.trials += 1
        return self.trials > self.patience


def check_finite_loss(losses, context: str = "train"):
    """NaN-loss failure detection (the reference aborts chemCPA training on
    NaN reconstruction loss -- experiments_run.py:336-343; elsewhere NaNs
    propagate silently). Raises FloatingPointError with the offending keys.
    """
    import math

    if isinstance(losses, dict):
        bad = [k for k, v in losses.items() if not math.isfinite(float(v))]
        if bad:
            raise FloatingPointError(
                f"non-finite {context} loss in {bad}: "
                f"{ {k: float(losses[k]) for k in bad} }"
            )
    else:
        if not math.isfinite(float(losses)):
            raise FloatingPointError(f"non-finite {context} loss: {losses}")
    return losses


def _restored_child(r, key, path):
    """Look up a template child in the orbax-restored plain tree by NAME
    (namedtuple field / dict key) or position (tuple index, which orbax
    stores as string integer keys)."""
    if isinstance(r, dict):
        for k in (key, str(key)):
            if k in r:
                return r[k]
    elif isinstance(r, (tuple, list)) and isinstance(key, int):
        if key < len(r):
            return r[key]
    raise KeyError(
        f"restored checkpoint has no entry for template node "
        f"'{'/'.join(map(str, path + (key,)))}' "
        f"(restored keys here: {list(r) if isinstance(r, dict) else type(r)})"
    )


def restore_into(template, restored):
    """Re-impose `template`'s pytree structure (namedtuples, custom nodes)
    onto an orbax-restored plain-dict tree: orbax serializes optax states
    as nested dicts, so optimizer-state resume needs the original
    structure back.

    Matches children BY KEY PATH (namedtuple field names / dict keys /
    tuple positions), not by flatten order: same-shaped sibling leaves
    (e.g. adam's mu/nu) can never be silently swapped even if orbax's
    dict ordering diverges from the namedtuple field order. Validates
    per-leaf shapes.
    """

    def rec(t, r, path):
        if t is None:
            return None
        if isinstance(t, dict):
            return {
                k: rec(v, _restored_child(r, k, path), path + (k,))
                for k, v in t.items()
            }
        if hasattr(t, "_fields"):  # namedtuple (optax states)
            vals = [
                rec(getattr(t, f), _restored_child(r, f, path), path + (f,))
                for f in t._fields
            ]
            return type(t)(*vals)
        if isinstance(t, (tuple, list)):
            vals = [
                rec(v, _restored_child(r, i, path), path + (str(i),))
                for i, v in enumerate(t)
            ]
            return type(t)(vals)
        ts = getattr(t, "shape", None)
        rs = getattr(r, "shape", None)
        if ts != rs:
            raise ValueError(
                f"leaf shape mismatch at "
                f"'{'/'.join(map(str, path))}': template {ts} vs "
                f"restored {rs}"
            )
        return r

    return rec(template, restored, ())
