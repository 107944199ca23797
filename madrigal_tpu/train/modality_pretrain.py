"""Stage-1 per-modality pretraining.

TPU-native equivalents of the reference's modality_pretraining/ scripts
(reference: modality_pretraining/str/structure_pretraining_muv.py GIN
property prediction; kg/kg_pretraining.py HGT link prediction with a shared
bilinear decoder over all edge types; cv/cv_pretraining.py MLP autoencoder
with MSE; tx/sweep.py chemCPA adaptation -- the chemCPA update() dynamics,
including the alternating adversary step with gradient penalty, live here
as `ChemCPAAdaptTrainer` mirroring chemCPA/model.py:729-829).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ChemCPAConfig, GINConfig, HGTConfig
from ..data.kg import HeteroKGBatch
from ..data.molgraph import MolGraphBatch
from ..models.chemcpa import ChemCPAEncoder, gaussian_nll_loss
from ..models.decoder import BilinearDDIScorer
from ..models.gin import GINEncoder
from ..models.hgt import HGTEncoder
from ..models.mlp import MLPEncoder


# ---------------------------------------------------------------------------
# Structure: GIN multi-task property prediction (MUV-style)
# ---------------------------------------------------------------------------

class GINPropertyModel(nn.Module):
    """GIN encoder + linear multi-task head (torchdrug PropertyPrediction
    semantics: mean-readout graph feature -> per-task logit)."""

    gin: GINConfig
    feature_dim: int
    num_tasks: int

    @nn.compact
    def __call__(self, batch: MolGraphBatch, *, train: bool = False):
        feat, _ = GINEncoder(
            hidden_dims=tuple(self.gin.hidden_dims) + (self.feature_dim,),
            num_mlp_layer=self.gin.num_mlp_layer,
            eps_init=self.gin.eps,
            learn_eps=self.gin.learn_eps,
            batch_norm=self.gin.batch_norm,
            actn=self.gin.actn,
            readout=self.gin.readout,
            name="encoder",
        )(batch, train=train)
        return nn.Dense(self.num_tasks, name="head")(feat)


class GINPretrainer:
    """BCE multi-task trainer with task masks (MUV has sparse labels)."""

    def __init__(self, gin_cfg: GINConfig, feature_dim: int, num_tasks: int,
                 lr: float = 1e-3, seed: int = 0):
        self.model = GINPropertyModel(gin=gin_cfg, feature_dim=feature_dim,
                                      num_tasks=num_tasks)
        self.tx = optax.adam(lr)
        self._vars = None
        self._opt = None
        self.rng = jax.random.PRNGKey(seed)
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        def step(variables, opt_state, batch, labels, label_mask, rng):
            def loss_fn(params):
                out, upd = self.model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    batch, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                per = optax.sigmoid_binary_cross_entropy(
                    out, labels.astype(out.dtype)
                )
                w = label_mask.astype(out.dtype)
                loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
                return loss, upd["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"]
            )
            updates, opt_state = self.tx.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            return {"params": params, "batch_stats": bs}, opt_state, loss

        return step

    def train_step(self, batch: MolGraphBatch, labels, label_mask) -> float:
        if self._vars is None:
            self.rng, k = jax.random.split(self.rng)
            self._vars = self.model.init(k, batch, train=False)
            self._vars = {"params": self._vars["params"],
                          "batch_stats": self._vars.get("batch_stats", {})}
            self._opt = self.tx.init(self._vars["params"])
        self.rng, k = jax.random.split(self.rng)
        self._vars, self._opt, loss = self._step(
            self._vars, self._opt, batch, jnp.asarray(labels),
            jnp.asarray(label_mask), k,
        )
        return float(loss)

    def encoder_params(self):
        return self._vars["params"]["encoder"], \
            self._vars["batch_stats"].get("encoder", {})


# ---------------------------------------------------------------------------
# KG: HGT link prediction (shared bilinear decoder across edge types)
# ---------------------------------------------------------------------------

class HGTLinkPredModel(nn.Module):
    """Reference HGTLinkPred (kg_pretraining.py:78-100): HGT encoder over
    all node types + ONE shared bilinear scorer applied per edge type."""

    hgt: HGTConfig
    feature_dim: int

    def setup(self):
        self.encoder = HGTEncoder(cfg=self.hgt, embed_dim=self.feature_dim,
                                  drug_only_head=False, name="encoder")
        self.decoder = BilinearDDIScorer(
            num_labels=1, input_dim1=self.feature_dim,
            input_dim2=self.feature_dim, name="decoder",
        )

    def __call__(self, kg: HeteroKGBatch, edge_queries, *, train=False):
        """edge_queries: list of (src_type, dst_type, src_idx, dst_idx)
        padded arrays; returns concatenated logits.

        Scoring runs over ONE flat node arena (per-type embeddings
        concatenated in metadata.node_types order, indices rebased by
        static type offsets) so all ~17 edge types share a single
        query-chunked scan that gathers inside the checkpointed chunk
        (BilinearDDIScorer.triples_indexed). At reference scale (~5M
        held-out queries, 122.5k nodes) this keeps peak query memory at
        one [chunk, D] block instead of the ~10 GB of per-type [T, D]
        gather temps that OOM the chip next to the full-graph HGT
        fwd+bwd."""
        z = self.encoder(kg, train=train)
        order = [nt for nt in kg.metadata.node_types if nt in z]
        offsets, total = {}, 0
        for nt in order:
            offsets[nt] = total
            total += z[nt].shape[0]
        z_all = jnp.concatenate([z[nt] for nt in order], axis=0)
        si_g = jnp.concatenate(
            [si + offsets[src_t] for src_t, _, si, _ in edge_queries])
        di_g = jnp.concatenate(
            [di + offsets[dst_t] for _, dst_t, _, di in edge_queries])
        return self.decoder.triples_indexed(
            z_all, si_g, di_g, jnp.zeros_like(si_g))


class HGTLinkPredTrainer:
    def __init__(self, hgt_cfg: HGTConfig, feature_dim: int, lr: float = 1e-3,
                 seed: int = 0):
        self.model = HGTLinkPredModel(hgt=hgt_cfg, feature_dim=feature_dim)
        self.tx = optax.adam(lr)
        self._vars = None
        self._opt = None
        self.rng = jax.random.PRNGKey(seed)
        self._steps = {}  # jitted step per static edge-type signature

    @staticmethod
    def make_link_split(kg_edges: Dict, rng: np.random.RandomState,
                        num_nodes: Dict[str, int],
                        neg_ratio: float = 2.0, holdout: float = 0.2):
        """RandomLinkSplit-style supervision: per edge type, hold out a
        fraction as positives and sample `neg_ratio` corrupted-dst
        negatives (kg_pretraining.py:41-75)."""
        queries, labels, message_edges = [], [], {}
        for et, ei in kg_edges.items():
            src_t, _, dst_t = et
            ei = np.asarray(ei)
            e = ei.shape[1]
            n_hold = max(1, int(e * holdout))
            perm = rng.permutation(e)
            held, kept = perm[:n_hold], perm[n_hold:]
            message_edges[et] = ei[:, kept]
            pos = ei[:, held]
            n_neg = int(n_hold * neg_ratio)
            neg_src = rng.choice(ei[0], n_neg)
            neg_dst = rng.randint(0, num_nodes[dst_t], n_neg)
            si = np.concatenate([pos[0], neg_src])
            di = np.concatenate([pos[1], neg_dst])
            queries.append((src_t, dst_t, jnp.asarray(si), jnp.asarray(di)))
            labels.append(np.concatenate(
                [np.ones(n_hold), np.zeros(n_neg)]))
        return queries, jnp.asarray(np.concatenate(labels)), message_edges

    def _make_step(self, types):
        """`types` (tuple of (src_t, dst_t)) is static; index arrays are
        dynamic jit args."""

        def step(variables, opt_state, kg, query_arrays, labels):
            def loss_fn(params):
                queries = [
                    (st, dt, si, di)
                    for (st, dt), (si, di) in zip(types, query_arrays)
                ]
                out = self.model.apply(
                    {"params": params}, kg, queries, train=True,
                )
                return jnp.mean(
                    optax.sigmoid_binary_cross_entropy(
                        out, labels.astype(out.dtype))
                )

            loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
            updates, opt_state = self.tx.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            return {"params": params}, opt_state, loss

        return jax.jit(step)

    def train_step(self, kg: HeteroKGBatch, edge_queries, labels) -> float:
        if self._vars is None:
            self.rng, k = jax.random.split(self.rng)
            v = self.model.init(k, kg, edge_queries, train=False)
            self._vars = {"params": v["params"]}
            self._opt = self.tx.init(self._vars["params"])
        types = tuple((q[0], q[1]) for q in edge_queries)
        arrays = [(q[2], q[3]) for q in edge_queries]
        if types not in self._steps:
            self._steps[types] = self._make_step(types)
        self._vars, self._opt, loss = self._steps[types](
            self._vars, self._opt, kg, arrays, labels
        )
        return float(loss)

    def encoder_params(self):
        return self._vars["params"]["encoder"]


# ---------------------------------------------------------------------------
# cv (tabular): MLP autoencoder with MSE (cv_pretraining.py:10-104)
# ---------------------------------------------------------------------------

class TabularAE(nn.Module):
    input_dim: int
    hidden_dims: Tuple[int, ...] = (512, 256)
    latent_dim: int = 128
    dropout: float = 0.2

    def setup(self):
        self.encoder = MLPEncoder(
            hidden_dims=self.hidden_dims, output_dim=self.latent_dim,
            dropout=self.dropout, norm=None, actn="relu", name="encoder",
        )
        self.decoder = MLPEncoder(
            hidden_dims=tuple(reversed(self.hidden_dims)),
            output_dim=self.input_dim, dropout=self.dropout, norm=None,
            actn="relu", name="decoder",
        )

    def __call__(self, x, *, train=False):
        h = nn.relu(self.encoder(x, train=train))
        h2 = nn.relu(h)
        recon = self.decoder(h2, train=train)
        return h, recon


class TabularAETrainer:
    def __init__(self, input_dim: int, hidden_dims=(512, 256),
                 latent_dim: int = 128, lr: float = 1e-3, seed: int = 0):
        self.model = TabularAE(input_dim=input_dim, hidden_dims=hidden_dims,
                               latent_dim=latent_dim)
        self.tx = optax.adam(lr)
        self._vars = None
        self._opt = None
        self.rng = jax.random.PRNGKey(seed)
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        def step(variables, opt_state, x, rng):
            def loss_fn(params):
                _, recon = self.model.apply(
                    {"params": params}, x, train=True,
                    rngs={"dropout": rng},
                )
                return jnp.mean((recon - x) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
            updates, opt_state = self.tx.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            return {"params": params}, opt_state, loss

        return step

    def train_step(self, x) -> float:
        x = jnp.asarray(x)
        if self._vars is None:
            self.rng, k = jax.random.split(self.rng)
            self._vars = {"params": self.model.init(k, x)["params"]}
            self._opt = self.tx.init(self._vars["params"])
        self.rng, k = jax.random.split(self.rng)
        self._vars, self._opt, loss = self._step(self._vars, self._opt, x, k)
        return float(loss)

    def encoder_params(self):
        return self._vars["params"]["encoder"]


# ---------------------------------------------------------------------------
# tx: chemCPA adaptation (model.py:729-829 update dynamics)
# ---------------------------------------------------------------------------

class ChemCPAAdaptTrainer:
    """Alternating AE / adversary optimization:
    every `adversary_steps`-th iteration updates the adversaries with a
    gradient penalty; other iterations update the autoencoder (+dosers)
    with GaussianNLL minus `reg_adversary*` terms. With disable_adv=True
    (the Madrigal adaptation default) only the AE step runs."""

    def __init__(self, cfg: ChemCPAConfig, lr: float = 1e-3,
                 adversary_lr: float = 1e-3, adversary_steps: int = 2,
                 reg_adversary: float = 5.0, reg_adversary_cov: float = 40.0,
                 penalty_adversary: float = 4.0, seed: int = 0):
        self.cfg = cfg
        self.model = ChemCPAEncoder(cfg=cfg)
        self.adversary_steps = adversary_steps
        self.reg_adversary = reg_adversary
        self.reg_adversary_cov = reg_adversary_cov
        self.penalty_adversary = penalty_adversary
        self.tx_ae = optax.adam(lr)
        self.tx_adv = optax.adam(adversary_lr)
        self.rng = jax.random.PRNGKey(seed)
        self._vars = None
        self.iteration = 0
        self._ae_step = jax.jit(self._make_ae_step())
        self._adv_step = (
            jax.jit(self._make_adv_step()) if not cfg.disable_adv else None
        )

    def _adv_names(self):
        return ("adversary_covariates", "adversary_drugs")

    def _frozen_names(self):
        """Parameters excluded from ALL optimizers: the rdkit2D descriptor
        table is frozen in the reference (chemCPA/embedding.py:10-20)."""
        if self.cfg.use_drugs and self.cfg.freeze_drug_embeddings:
            return ("drug_embeddings",)
        return ()

    def _split(self, params):
        skip = set(self._adv_names()) | set(self._frozen_names())
        ae = {k: v for k, v in params.items() if k not in skip}
        adv = {k: v for k, v in params.items() if k in self._adv_names()}
        return ae, adv

    def _make_ae_step(self):
        def step(variables, opt_state, genes, cov_idx, drugs_idx, dosages):
            bs = variables["batch_stats"]

            def loss_fn(ae_params):
                held = set(self._adv_names()) | set(self._frozen_names())
                params = {**ae_params,
                          **{k: variables["params"][k]
                             for k in held
                             if k in variables["params"]}}
                (mean, var), upd = self.model.apply(
                    {"params": params, "batch_stats": bs},
                    genes, cov_idx, drugs_idx, dosages, train=True,
                    mutable=["batch_stats"],
                    method=ChemCPAEncoder.reconstruct,
                )
                loss = gaussian_nll_loss(mean, var, genes)
                if not self.cfg.disable_adv:
                    # running-stat (eval) BN for the auxiliary adversary
                    # regularizer; the reconstruction pass above already
                    # updates batch statistics
                    basal = self.model.apply(
                        {"params": params, "batch_stats": bs},
                        genes, train=False,
                        method=lambda m, g, train: m.latent_basal(
                            g, train=train),
                    )
                    adv_logits = self.model.apply(
                        {"params": params, "batch_stats": bs},
                        basal,
                        method=lambda m, b: m.adversary_covariates(b),
                    )
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        adv_logits, cov_idx
                    ).mean()
                    loss = loss - self.reg_adversary_cov * ce
                return loss, upd["batch_stats"]

            ae_params, _ = self._split(variables["params"])
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ae_params)
            updates, opt_state = self.tx_ae.update(grads, opt_state,
                                                   ae_params)
            new_ae = optax.apply_updates(ae_params, updates)
            params = {**variables["params"], **new_ae}
            return ({"params": params, "batch_stats": new_bs}, opt_state,
                    loss)

        return step

    def _make_adv_step(self):
        def step(variables, opt_state, genes, cov_idx):
            bs = variables["batch_stats"]

            def basal_fn(g):
                return self.model.apply(
                    {"params": variables["params"], "batch_stats": bs},
                    g, train=False,
                    method=lambda m, x, train: m.latent_basal(x, train=train),
                )

            basal = basal_fn(genes)

            def loss_fn(adv_params):
                params = {**variables["params"], **adv_params}

                def adv_out(b):
                    return self.model.apply(
                        {"params": params, "batch_stats": bs}, b,
                        method=lambda m, x: m.adversary_covariates(x),
                    )

                logits = adv_out(basal)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, cov_idx
                ).mean()
                # gradient penalty wrt the basal latent (model.py:783-798)
                grad_b = jax.grad(lambda b: adv_out(b).sum())(basal)
                penalty = jnp.mean(grad_b ** 2)
                return ce + self.penalty_adversary * penalty

            _, adv_params = self._split(variables["params"])
            loss, grads = jax.value_and_grad(loss_fn)(adv_params)
            updates, opt_state = self.tx_adv.update(grads, opt_state,
                                                    adv_params)
            new_adv = optax.apply_updates(adv_params, updates)
            params = {**variables["params"], **new_adv}
            return ({"params": params, "batch_stats": bs}, opt_state, loss)

        return step

    def _init(self, genes, cov_idx, drugs_idx, dosages):
        self.rng, k = jax.random.split(self.rng)
        v = self.model.init(
            k, genes, cov_idx, drugs_idx, dosages,
            method=ChemCPAEncoder.warmup,
        )
        self._vars = {"params": v["params"],
                      "batch_stats": v.get("batch_stats", {})}
        ae, adv = self._split(self._vars["params"])
        self._opt_ae = self.tx_ae.init(ae)
        self._opt_adv = self.tx_adv.init(adv) if adv else None

    def train_step(self, genes, cov_idx, drugs_idx=None, dosages=None
                   ) -> Dict[str, float]:
        genes = jnp.asarray(genes)
        cov_idx = jnp.asarray(cov_idx)
        if drugs_idx is not None:
            drugs_idx = jnp.asarray(drugs_idx)
            dosages = jnp.asarray(dosages)
        if self._vars is None:
            self._init(genes, cov_idx, drugs_idx, dosages)

        run_adv = (
            not self.cfg.disable_adv
            and self.iteration % self.adversary_steps == 0
        )
        if run_adv:
            self._vars, self._opt_adv, loss = self._adv_step(
                self._vars, self._opt_adv, genes, cov_idx
            )
            out = {"loss_adv": float(loss)}
        else:
            self._vars, self._opt_ae, loss = self._ae_step(
                self._vars, self._opt_ae, genes, cov_idx, drugs_idx, dosages
            )
            out = {"loss_reconstruction": float(loss)}
        self.iteration += 1
        return out

    def encoder_variables(self):
        return self._vars


def evaluate_r2_tx_adapting(trainer: "ChemCPAAdaptTrainer", genes, cov_idx,
                            drugs_idx=None, dosages=None) -> float:
    """Uniform-average R2 of the reconstructed means against the true
    signatures (reference: chemCPA/train.py:242-265
    evaluate_r2_tx_adapting)."""
    import numpy as np

    mean, _ = trainer.model.apply(
        trainer._vars, jnp.asarray(genes), jnp.asarray(cov_idx),
        None if drugs_idx is None else jnp.asarray(drugs_idx),
        None if dosages is None else jnp.asarray(dosages),
        train=False, method=type(trainer.model).reconstruct,
    )
    y_true = np.asarray(genes)
    y_pred = np.clip(np.asarray(mean), -3e12, 3e12)
    ss_res = ((y_true - y_pred) ** 2).sum(axis=0)
    ss_tot = ((y_true - y_true.mean(axis=0)) ** 2).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = 1.0 - ss_res / ss_tot
    return float(np.nanmean(r2))


def _r2(y_true, y_pred) -> float:
    ss_res = float(((y_true - y_pred) ** 2).sum())
    ss_tot = float(((y_true - y_true.mean()) ** 2).sum())
    return 1.0 - ss_res / ss_tot if ss_tot > 0 else float("-inf")


def evaluate_r2_per_category(
    trainer: "ChemCPAAdaptTrainer",
    genes_treated,
    cov_idx_treated,
    genes_control,
    categories,
    drugs_idx=None,
    dosages=None,
    de_gene_idx: Optional[Dict[str, "np.ndarray"]] = None,
    min_count: int = 5,
):
    """Per-(covariate, drug, dose)-category R2 about MEANS and VARIANCES,
    over all genes and over differentially-expressed genes (reference:
    chemCPA/train.py:268-460 evaluate_r2): translate the CONTROL
    population into each category's condition and compare predicted
    mean/variance profiles against the category's true profiles.

    de_gene_idx optionally maps category -> gene indices (the reference's
    de_genes lookup); without it the DE scores equal the all-gene scores
    (the reference's own LINCS fallback, train.py:112).
    Returns dict with mean_score / mean_score_de / var_score /
    var_score_de (means over categories; -inf categories dropped, as the
    reference filters them).
    """
    import numpy as np

    genes_treated = np.asarray(genes_treated)
    cov_idx_treated = np.asarray(cov_idx_treated)
    genes_control = np.asarray(genes_control)
    categories = np.asarray(categories)
    n_rows = genes_control.shape[0]

    buckets = {"mean_score": [], "mean_score_de": [],
               "var_score": [], "var_score_de": []}
    for cat, count in zip(*np.unique(categories, return_counts=True)):
        if count <= min_count:
            continue
        low = str(cat).lower()
        if "dmso" in low or "control" in low:
            continue
        idx_all = np.nonzero(categories == cat)[0]
        i0 = idx_all[0]
        d_idx = (None if drugs_idx is None
                 else jnp.full((n_rows,), int(np.asarray(drugs_idx)[i0]),
                               jnp.int32))
        dose = (None if dosages is None
                else jnp.full((n_rows,), float(np.asarray(dosages)[i0]),
                              jnp.float32))
        mean, var = trainer.model.apply(
            trainer._vars, jnp.asarray(genes_control),
            jnp.full((n_rows,), int(cov_idx_treated[i0]), jnp.int32),
            d_idx, dose, train=False,
            method=type(trainer.model).reconstruct,
        )
        y_true = genes_treated[idx_all]
        yt_m, yt_v = y_true.mean(axis=0), y_true.var(axis=0)
        yp_m = np.asarray(mean).mean(axis=0)
        yp_v = np.asarray(var).mean(axis=0)
        de = (np.asarray(de_gene_idx[cat]) if de_gene_idx and cat in
              de_gene_idx else np.arange(y_true.shape[1]))
        pairs = {
            "mean_score": (yt_m, yp_m),
            "var_score": (yt_v, yp_v),
            "mean_score_de": (yt_m[de], yp_m[de]),
            "var_score_de": (yt_v[de], yp_v[de]),
        }
        for name, (t, p) in pairs.items():
            r2 = _r2(t, p)
            if np.isfinite(r2):
                buckets[name].append(r2)
    return {k: (float(np.mean(v)) if v else float("nan"))
            for k, v in buckets.items()}


def evaluate_disentanglement(
    trainer: "ChemCPAAdaptTrainer",
    genes,
    label_sets: Dict[str, "np.ndarray"],
    epochs: int = 400,
    hidden_layers: int = 2,
    lr: float = 1e-2,
    seed: int = 0,
) -> Dict[str, float]:
    """Latent-basal disentanglement probe (reference: chemCPA/train.py:
    159-239 evaluate_disentanglement + its use at train.py:462-481).

    Normalizes the basal latent, then trains a small MLP classifier
    (hidden_layers non-linear layers of latent width + a linear head,
    adam lr=1e-2 -- the reference's probe) to predict each label set
    (drug identity, covariates). Returns {name: probe accuracy} plus
    {name+'_optimal': majority-class frequency} -- an accuracy near
    optimal means the latent is disentangled from that factor.
    """
    import numpy as np
    import optax

    basal = trainer.model.apply(
        trainer._vars, jnp.asarray(genes), train=False,
        method=lambda m, g, train: m.latent_basal(g, train=train),
    )
    basal = np.asarray(basal)
    mean = basal.mean(axis=0, keepdims=True)
    std = basal.std(axis=0, keepdims=True)  # biased, as torch unbiased=False
    z = jnp.asarray((basal - mean) / np.maximum(std, 1e-8))

    out: Dict[str, float] = {}
    for name, labels in label_sets.items():
        labels = np.asarray(labels)
        uniq, y = np.unique(labels, return_inverse=True)
        n_cls = len(uniq)
        out[name + "_optimal"] = float(
            np.bincount(y).max() / len(y)
        )
        if n_cls < 2:
            out[name] = 1.0
            continue
        dim = z.shape[1]
        rng = jax.random.PRNGKey(seed)
        sizes = [dim] * (hidden_layers + 1) + [n_cls]
        params = []
        for i in range(len(sizes) - 1):
            rng, k = jax.random.split(rng)
            params.append({
                "w": jax.random.normal(k, (sizes[i], sizes[i + 1]))
                * jnp.sqrt(2.0 / sizes[i]),
                "b": jnp.zeros(sizes[i + 1]),
            })

        def forward(ps, x):
            for j, p in enumerate(ps):
                x = x @ p["w"] + p["b"]
                if j < len(ps) - 1:
                    x = jax.nn.relu(x)
            return x

        tx = optax.adam(lr)
        opt = tx.init(params)
        yj = jnp.asarray(y)

        @jax.jit
        def step(ps, opt):
            def loss_fn(ps):
                return optax.softmax_cross_entropy_with_integer_labels(
                    forward(ps, z), yj
                ).mean()

            g = jax.grad(loss_fn)(ps)
            upd, opt = tx.update(g, opt, ps)
            return optax.apply_updates(ps, upd), opt

        for _ in range(epochs):
            params, opt = step(params, opt)
        pred = np.asarray(jnp.argmax(forward(params, z), axis=1))
        out[name] = float((pred == y).mean())
    return out


def evaluate_logfold_r2(
    trainer: "ChemCPAAdaptTrainer",
    genes_treated,
    cov_idx_treated,
    genes_control,
    cov_idx_control,
    categories,
    drugs_idx=None,
    dosages=None,
    min_count: int = 5,
    eps: float = 1e-5,
):
    """Log2-fold-change R2 + sign accuracy vs control (reference:
    chemCPA/train.py:73-157 evaluate_logfold_r2).

    For each (covariate, drug, dose) category with > min_count treated
    rows: predict the treated response from that covariate's CONTROL
    genes carrying the treated drug/dose, then compare
    log2((pred+eps)/(ctrl+eps)) against log2((true+eps)/(ctrl+eps)).
    Returns (mean logfold R2, mean sign accuracy) over categories, or
    (nan, nan) when no category qualifies.
    """
    import numpy as np

    genes_treated = np.asarray(genes_treated)
    cov_idx_treated = np.asarray(cov_idx_treated)
    genes_control = np.asarray(genes_control)
    cov_idx_control = np.asarray(cov_idx_control)
    categories = np.asarray(categories)

    r2s, signs = [], []
    for cat, count in zip(*np.unique(categories, return_counts=True)):
        if count <= min_count:
            continue
        idx_all = np.nonzero(categories == cat)[0]
        i0 = idx_all[0]
        cov = cov_idx_treated[i0]
        ctrl_rows = np.nonzero(cov_idx_control == cov)[0]
        if len(ctrl_rows) <= 1:
            continue
        g_ctrl = genes_control[ctrl_rows]
        n = len(ctrl_rows)
        d_idx = (None if drugs_idx is None
                 else jnp.full((n,), int(np.asarray(drugs_idx)[i0]),
                               jnp.int32))
        dose = (None if dosages is None
                else jnp.full((n,), float(np.asarray(dosages)[i0]),
                              jnp.float32))
        mean, _ = trainer.model.apply(
            trainer._vars, jnp.asarray(g_ctrl),
            jnp.full((n,), int(cov), jnp.int32), d_idx, dose,
            train=False, method=type(trainer.model).reconstruct,
        )
        y_ctrl = g_ctrl.mean(axis=0)
        y_pred = np.asarray(mean).mean(axis=0)
        y_true = genes_treated[idx_all].mean(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            pred_lfc = np.log2((y_pred + eps) / (y_ctrl + eps))
            true_lfc = np.log2((y_true + eps) / (y_ctrl + eps))
        # genes with non-positive (pred+eps) produce non-finite logfolds
        # (LINCS values can be negative); restrict to finite entries,
        # mirroring the reference's -inf category filtering (train.py:440)
        ok = np.isfinite(pred_lfc) & np.isfinite(true_lfc)
        if ok.sum() < 2:
            continue
        pred_lfc, true_lfc = pred_lfc[ok], true_lfc[ok]
        ss_res = ((true_lfc - pred_lfc) ** 2).sum()
        ss_tot = ((true_lfc - true_lfc.mean()) ** 2).sum()
        if ss_tot > 0:
            r2s.append(float(1.0 - ss_res / ss_tot))
        signs.append(float(((pred_lfc * true_lfc) > 0).mean()))
    if not r2s:
        return float("nan"), float("nan")
    import statistics

    return statistics.mean(r2s), statistics.mean(signs)
