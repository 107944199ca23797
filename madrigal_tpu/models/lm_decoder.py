"""LM-decoder: zero-shot outcome generalization via text embeddings.

TPU-native equivalent of the reference's LM_decoder auxiliary model
(reference: LM_decoder/model.py:30-144 NovelDDILM): frozen Madrigal drug
embeddings + language-model embeddings of outcome descriptions (Mistral-7B
4096-d or BERT 768-d) are projected to a shared space and scored by either
a concat-MLP or a 3-token self-attention block + MLP.

Text embeddings arrive as precomputed vectors (the reference extracts them
with transformers + an OpenAI paraphrase pipeline, LM_decoder/
embeddings.py; extraction is host-side and model-weight-gated, so this
module consumes the [num_outcomes, lm_dim] matrix directly --
`extract_text_embeddings` below wraps transformers when weights are
available locally).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiheadAttention


class LMDecoder(nn.Module):
    """Score (drug_head, drug_tail, outcome_text) triples."""

    lm_emb_dim: int = 768  # 4096 for Mistral-7B
    drug_dim: int = 128
    project_dim: int = 256
    mlp_dim: int = 512
    dropout: float = 0.1
    self_att: bool = True
    num_heads: int = 4
    normalize: bool = False

    @nn.compact
    def __call__(self, z_head, z_tail, text_embeddings, *,
                 train: bool = False):
        """z_head/z_tail: [B, drug_dim] frozen Madrigal embeddings;
        text_embeddings: [B, lm_emb_dim] outcome-description embeddings.
        Returns [B] logits."""
        if self.normalize:
            z_head = z_head / jnp.linalg.norm(z_head, axis=-1, keepdims=True)
            z_tail = z_tail / jnp.linalg.norm(z_tail, axis=-1, keepdims=True)

        # the reference shares one drug projection for head and tail
        # (LM_decoder/model.py:124-125)
        drug_dense = nn.Dense(self.project_dim, name="drug_project")
        text_dense = nn.Dense(self.project_dim, name="text_project")
        drop = nn.Dropout(rate=self.dropout, deterministic=not train)
        zh = drop(nn.silu(drug_dense(z_head)))
        zt = drop(nn.silu(drug_dense(z_tail)))
        zx = drop(nn.silu(text_dense(text_embeddings)))

        if self.self_att:
            seq = jnp.stack([zx, zh, zt], axis=1)  # [B, 3, D]
            attn = MultiheadAttention(
                embed_dim=self.project_dim, num_heads=self.num_heads,
                name="multihead_attn",
            )(seq, seq, seq, train=train)
            feats = attn.reshape(attn.shape[0], -1)  # concat 3 tokens
        else:
            feats = jnp.concatenate([zx, zh, zt], axis=-1)

        h = nn.Dense(self.mlp_dim, name="out_dense1")(feats)
        h = nn.silu(h)
        h = nn.Dropout(rate=self.dropout, deterministic=not train,
                       name="out_drop")(h)
        return nn.Dense(1, name="out_dense2")(h)[:, 0]


PARAPHRASE_TEMPLATES = (
    "{}",
    "The interaction may result in: {}",
    "Co-administration can cause {}",
    "Risk of {} when the two drugs are combined",
    "Combining these drugs is associated with {}",
    "{} (adverse drug-drug interaction)",
    "Observed outcome of the drug pair: {}",
    "This drug combination can lead to {}",
    "Clinical effect reported for the pair: {}",
    "Potential for {} with concomitant use",
)


def build_paraphrase_bank(texts, num_variants: int = 10,
                          model_name: str = "bert-base-uncased",
                          embed_fn=None):
    """[P, L, lm_dim] paraphrase-variant embedding bank.

    The reference generates 10 GPT paraphrases per outcome description
    via the OpenAI API (LM_decoder/openai_api_request_parallel_processor.
    py + data.py:48-69); with no API egress this builds deterministic
    template variants instead and embeds each set -- same bank shape and
    training/eval semantics (one variant sampled per row per step).
    Pass reference-generated paraphrase CSVs through
    `extract_text_embeddings` per column to reproduce the original bank.
    """
    import numpy as np

    if embed_fn is None:
        embed_fn = lambda ts: extract_text_embeddings(ts, model_name)
    banks = []
    for p in range(num_variants):
        tmpl = PARAPHRASE_TEMPLATES[p % len(PARAPHRASE_TEMPLATES)]
        banks.append(embed_fn([tmpl.format(t) for t in texts]))
    return np.stack(banks)


def extract_text_embeddings(texts, model_name: str = "bert-base-uncased",
                            device: str = "cpu"):
    """Mean-pooled last-hidden-state embeddings via transformers
    (LM_decoder/embeddings.py:16 analog). Requires model weights locally;
    raises a clear error otherwise (this environment has no egress)."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name,
                                            local_files_only=True)
        mdl = AutoModel.from_pretrained(model_name, local_files_only=True)
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            f"text-embedding extraction needs local weights for "
            f"{model_name}: {e}"
        )
    import numpy as np

    out = []
    with torch.no_grad():
        for t in texts:
            enc = tok(t, return_tensors="pt", truncation=True)
            h = mdl(**enc).last_hidden_state[0]
            out.append(h.mean(0).numpy())
    return np.stack(out)
