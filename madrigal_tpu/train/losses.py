"""Loss functions.

* masked_bce: BCE over sigmoid scores on selected triples, matching the
  reference's `torch.sigmoid(model(...))` + `nn.BCELoss` on fancy-indexed
  entries (reference: train_ddi_batch.py:285-351, utils.py:616-625) --
  computed here from logits with the numerically-stable formulation.
* info_nce: SimCLR contrastive loss with diagonal masking and optional
  too-hard-negative masking (reference: madrigal/models/simclr.py:74-108).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def masked_bce(logits, targets, weights, readout: str = "mean"):
    """Stable BCE-with-logits over rows weighted by `weights` (0/1 mask)."""
    per = optax.sigmoid_binary_cross_entropy(logits, targets.astype(logits.dtype))
    w = weights.astype(logits.dtype)
    if readout == "mean":
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(per * w)


def info_nce(aug1, aug2, temperature: float, too_hard_neg_mask=None):
    """SimCLR InfoNCE (simclr.py:74-108).

    features = [aug1; aug2] L2-normalized; similarity NxN (N=2B); diagonal
    removed; positives are the (i, i+B) pairs; CE over the remaining 2B-1
    columns. Returns (logits, labels_onehot, loss).
    """
    n = aug1.shape[0]
    feats = jnp.concatenate([aug1, aug2], axis=0)
    feats = feats / jnp.linalg.norm(feats, axis=1, keepdims=True)
    sim = feats @ feats.T

    if too_hard_neg_mask is not None:
        big = jnp.tile(too_hard_neg_mask, (2, 2))
        sim = jnp.where(big, -1e9, sim)

    labels = jnp.concatenate([jnp.arange(n)] * 2)
    pos_mat = labels[None, :] == labels[:, None]
    eye = jnp.eye(2 * n, dtype=bool)

    # drop the diagonal, keeping a [2n, 2n-1] matrix (reference reshapes
    # after boolean-masking; here we shift columns left past the diagonal)
    def drop_diag(m):
        idx = jnp.arange(2 * n - 1)[None, :]
        row = jnp.arange(2 * n)[:, None]
        col = idx + (idx >= row)
        return m[row, col]

    sim_nd = drop_diag(sim)
    pos_nd = drop_diag(pos_mat.astype(jnp.float32))

    logits = sim_nd / temperature
    # exactly one positive per row
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.sum(pos_nd * logp, axis=-1))
    return logits, pos_nd, loss


def ce_loss_for_pairs(logits_all_labels, labels, weights,
                      readout: str = "mean"):
    """Multiclass cross-entropy over per-pair label logits
    (reference get_loss_fn 'ce' branch, utils.py:620-622; the DrugBank
    multiclass task -- parse_args.py:117).

    logits_all_labels: [T, L] per-pair scores across all outcomes;
    labels: [T] int targets; weights: [T] 0/1 mask.
    """
    import optax as _optax

    per = _optax.softmax_cross_entropy_with_integer_labels(
        logits_all_labels, labels
    )
    w = weights.astype(per.dtype)
    if readout == "mean":
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(per * w)
