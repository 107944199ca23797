"""Full 3-stage pipeline integration: stage-1 modality pretraining ->
stage-2 contrastive alignment -> stage-3 DDI finetuning -> serving, with
weight transfer at each boundary (the complete reference workflow)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    GINConfig,
    HGTConfig,
    MLPEncoderConfig,
    ModelConfig,
    OptimizerConfig,
    PretrainConfig,
    ProjectorConfig,
    TrainConfig,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.molgraph import pack_molecules
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.train.checkpoint import (
    filter_cl_params_for_finetune,
    merge_params,
)
from madrigal_tpu.train.finetune import FinetuneTrainer, TrainState
from madrigal_tpu.train.modality_pretrain import (
    ChemCPAAdaptTrainer,
    GINPretrainer,
    HGTLinkPredTrainer,
    TabularAETrainer,
)
from madrigal_tpu.train.pretrain_cl import CLPretrainer
from madrigal_tpu.train.transfer import encoder_params_from_stage1

FEAT = 16
GIN_CFG = GINConfig(hidden_dims=(FEAT,), num_mlp_layer=2)
HGT_CFG = HGTConfig(hidden_dim=8, num_layers=2, att_heads=2)
CHEMCPA_CFG = ChemCPAConfig(dim=FEAT, autoencoder_width=32,
                            autoencoder_depth=1, num_genes=978)


def enc_cfg():
    return EncoderConfig(
        feature_dim=FEAT,
        gin=GIN_CFG,
        hgt=HGT_CFG,
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        chemcpa=CHEMCPA_CFG,
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.1, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32)),
        pos_emb_type="sinusoidal",
    )


@pytest.mark.slow
def test_three_stage_pipeline(tmp_path):
    ds = make_dataset(num_drugs=14, num_labels=4, num_edges=20, seed=30)
    coll = DDICollator(ds, split="train")
    kg = coll.kg_batch()

    # ---------------- stage 1: per-modality pretraining ----------------
    rng = np.random.RandomState(0)
    gin_tr = GINPretrainer(GIN_CFG, feature_dim=FEAT, num_tasks=3, lr=3e-3)
    mols = pack_molecules(ds.molecules)
    labels = (rng.rand(ds.num_drugs, 3) < 0.3).astype(np.float32)
    for _ in range(3):
        gin_tr.train_step(mols, labels, np.ones_like(labels))

    kg_tr = HGTLinkPredTrainer(HGT_CFG, feature_dim=FEAT, lr=3e-3)
    num_nodes = {k: v.shape[0] for k, v in ds.kg_node_feats.items()}
    q, lab, msg_edges = kg_tr.make_link_split(
        ds.kg_edge_indices, rng, num_nodes)
    from madrigal_tpu.data.kg import build_kg_batch

    kg_msg = build_kg_batch(ds.kg_node_feats, msg_edges, ds.kg_drug_ids)
    for _ in range(3):
        kg_tr.train_step(kg_msg, q, lab)

    cv_tr = TabularAETrainer(input_dim=559, hidden_dims=(32, 16),
                             latent_dim=FEAT, lr=3e-3)
    for _ in range(3):
        cv_tr.train_step(ds.cv_table)

    tx_tr = ChemCPAAdaptTrainer(CHEMCPA_CFG, lr=3e-3)
    genes = ds.tx_table[0, :, :]
    cov = np.zeros(ds.num_drugs, np.int64)
    for _ in range(3):
        tx_tr.train_step(genes, cov)

    # ---------------- stage 2: CL with stage-1 warm start ----------------
    cl_cfg = PretrainConfig(
        encoder=enc_cfg(), pretrain_mode="str_center_uni",
        pretrain_unbalanced=True, raw_encoder_output=True,
        pretrain_batch_size=8, pretrain_num_epochs=10, warmup_epochs=1,
        pretrain_lr=1e-3,
    )
    cl = CLPretrainer(cl_cfg, coll, kg)
    p, s = encoder_params_from_stage1(
        cl.state.params["base_encoder"],
        cl.state.batch_stats.get("base_encoder", {}),
        str_pretrainer=gin_tr, kg_pretrainer=kg_tr, cv_pretrainer=cv_tr,
        tx_pretrainer=tx_tr,
    )
    # verify the transfer actually landed: stage-1 GIN weights present
    src = np.asarray(gin_tr.encoder_params()[0]["layer_0"]["mlp_0"]["kernel"])
    dst = np.asarray(p["str_encoder"]["layer_0"]["mlp_0"]["kernel"])
    np.testing.assert_array_equal(src, dst)

    new_params = dict(cl.state.params)
    new_params["base_encoder"] = p
    new_bs = dict(cl.state.batch_stats)
    new_bs["base_encoder"] = merge_params(
        new_bs.get("base_encoder", {}), s
    ) if s else new_bs.get("base_encoder", {})
    cl.state = dataclasses.replace(cl.state, params=new_params,
                                   batch_stats=new_bs)
    cl_losses = [cl.train_step() for _ in range(3)]
    assert np.isfinite(cl_losses).all()

    # ---------------- stage 3: finetune with CL warm start ----------------
    ft_cfg = TrainConfig(
        model=ModelConfig(encoder=enc_cfg(), prediction_dim=ds.num_labels),
        optim=OptimizerConfig(structure_encoder_lr=3e-3, kg_encoder_lr=3e-3,
                              perturb_encoders_lr=3e-3, fusion_lr=3e-3,
                              decoder_lr=3e-3),
        finetune_mode="str_random_sample", num_epochs=6, warmup_epochs=1,
        seed=0,
    )
    batch, _ = coll()
    ft = FinetuneTrainer(ft_cfg, batch, kg)
    enc_cl = cl.encoder_variables()
    kept = filter_cl_params_for_finetune(enc_cl["params"])
    merged = merge_params(ft.state.params["encoder"], kept)
    # CL-trained GIN weights flow through to the finetune model
    cl_gin = np.asarray(
        enc_cl["params"]["str_encoder"]["layer_0"]["mlp_0"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(merged["str_encoder"]["layer_0"]["mlp_0"]["kernel"]),
        cl_gin,
    )
    params = dict(ft.state.params)
    params["encoder"] = merged
    ft.state = TrainState(params=params, batch_stats=ft.state.batch_stats,
                          opt_state=ft.state.opt_state, epoch=ft.state.epoch)
    losses = [ft.train_epoch()["total"] for _ in range(4)]
    assert np.isfinite(losses).all()

    # ---------------- serve ----------------
    from madrigal_tpu.eval.predict import embed_all_drugs, score_all_pairs

    variables = {"params": ft.state.params,
                 "batch_stats": ft.state.batch_stats}
    z = embed_all_drugs(ft.model, variables, coll, kg)
    scores = score_all_pairs(ft.model, variables, z, label_chunk=2)
    assert scores.shape == (ds.num_labels, ds.num_drugs, ds.num_drugs)
    assert np.isfinite(scores).all()
