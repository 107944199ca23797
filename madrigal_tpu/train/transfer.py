"""Cross-stage weight transfer.

Assembles MadrigalEncoder parameter trees from stage-1 modality
pretrainers, mirroring the reference's pretrained-encoder loading
(reference: models.py:219-230 str, 242-245 kg, 254-257 cv, 300-342 tx;
`use_modality_pretrain=True` path) -- and composes with the CL->finetune
filter in train/checkpoint.py for the full 3-stage pipeline:

  stage-1 per-modality -> stage-2 contrastive encoder -> stage-3 DDI model.
"""
from __future__ import annotations



from .checkpoint import merge_params


def _filtered(target: dict, src: dict) -> dict:
    """Recursively keep only src keys the target tree declares (drops
    stage-1-only heads: link-pred per-type heads, chemCPA decoder +
    adversaries -- the reference's key filtering, models.py:309-312)."""
    out = {}
    for k, v in src.items():
        if k not in target:
            continue
        if isinstance(v, dict) and isinstance(target[k], dict):
            out[k] = _filtered(target[k], v)
        else:
            out[k] = v
    return out


def overlay_stage1_checkpoint(enc_params: dict, enc_stats: dict, tree: dict):
    """Overlay a cli/modality_pretrain checkpoint tree (params keyed by
    `{str,kg,cv,tx}_encoder`) onto a MadrigalEncoder params/batch_stats
    pair, in place-of (returns new dicts)."""
    params = dict(enc_params)
    stats = dict(enc_stats)
    for key, sub in (tree.get("params") or {}).items():
        if key not in params:
            raise KeyError(f"checkpoint subtree '{key}' not in encoder")
        params[key] = merge_params(params[key], _filtered(params[key], sub))
    for key, sub in (tree.get("batch_stats") or {}).items():
        if not sub:
            continue
        if key in stats and stats[key]:
            stats[key] = merge_params(stats[key], _filtered(stats[key], sub))
        elif key in params:
            # fresh stats subtree: drop stage-1-only heads by name so the
            # state pytree matches the encoder (stat leaf names -- mean/var
            # -- differ from param leaves, so structural filtering against
            # params would wrongly drop them)
            stats[key] = {
                k: v for k, v in sub.items()
                if k != "decoder" and not k.startswith("adversary")
            }
    return params, stats


def encoder_params_from_stage1(
    base_encoder_params: dict,
    base_batch_stats: dict,
    str_pretrainer=None,
    kg_pretrainer=None,
    cv_pretrainer=None,
    tx_pretrainer=None,
):
    """Overlay stage-1 encoder weights onto a freshly-initialized
    MadrigalEncoder tree. Returns (params, batch_stats).

    * str: GINPretrainer's GIN conv stack (the MUV-pretraining analog).
    * kg: HGTLinkPredTrainer's HGT convs + drug head (extra per-type heads
      from link prediction are dropped -- the DDI encoder is drug-only).
    * cv: TabularAETrainer's encoder MLP (the AE-encoder loading analog).
    * tx: ChemCPAAdaptTrainer's full variable tree (adversaries dropped,
      like the reference's key filtering at models.py:309-312).
    """
    params = dict(base_encoder_params)
    stats = dict(base_batch_stats)

    if str_pretrainer is not None:
        p, s = str_pretrainer.encoder_params()
        params["str_encoder"] = merge_params(params["str_encoder"], p)
        if s:
            stats["str_encoder"] = merge_params(
                stats.get("str_encoder", {}), s
            )

    if kg_pretrainer is not None:
        kg_p = dict(kg_pretrainer.encoder_params())
        target = params["kg_encoder"]
        kept = {k: v for k, v in kg_p.items() if k in target}
        params["kg_encoder"] = merge_params(target, kept)

    if cv_pretrainer is not None:
        params["cv_encoder"] = merge_params(
            params["cv_encoder"], cv_pretrainer.encoder_params()
        )

    if tx_pretrainer is not None:
        v = tx_pretrainer.encoder_variables()
        # keep only the predict-path submodules the DDI encoder declares
        # (drop adversaries like the reference's key filter,
        # models.py:309-312, and the AE decoder -- extra keys would desync
        # the optimizer-state tree from the param tree)
        kept = {k: x for k, x in v["params"].items()
                if k in params["tx_encoder"]}
        params["tx_encoder"] = merge_params(params["tx_encoder"], kept)
        bs = v.get("batch_stats", {})
        if bs:
            kept_bs = {k: x for k, x in bs.items()
                       if not k.startswith("adversary_")}
            stats["tx_encoder"] = merge_params(
                stats.get("tx_encoder", {}), kept_bs
            )

    return params, stats
