"""HGT KG-encoder parity vs a torch fixture implementing the documented
PyG 2.3 HGTConv math (the reference builds torch_geometric.nn.HGTConv at
madrigal/models/models.py:71-96; PyG itself is not installed here, so the
fixture is the oracle for the per-edge-type attention semantics)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from madrigal_tpu.config import HGTConfig
from madrigal_tpu.data.kg import (
    HeteroKGBatch,
    build_kg_batch,
    drug_row_lookup,
    edge_key,
    remove_edges_attached_to_drugs,
)
from madrigal_tpu.models.hgt import HGTEncoder


def torch_hgt_conv(x_dict, edges, params, heads, out_channels, group="sum"):
    """One HGTConv layer in torch: per-node-type kqv, per-edge-type k/v
    relation transforms + scaled-dot attention with segment softmax over
    destinations, grouped aggregation, gelu + out linear + sigmoid-skip."""
    H, F = heads, out_channels
    D = F // H
    k_d, q_d, v_d = {}, {}, {}
    for nt, x in x_dict.items():
        kqv = x @ params[f"kqv__{nt}"]["kernel"] + params[f"kqv__{nt}"]["bias"]
        k, q, v = np.split(kqv, 3, axis=-1)
        k_d[nt] = k.reshape(-1, H, D)
        q_d[nt] = q.reshape(-1, H, D)
        v_d[nt] = v.reshape(-1, H, D)

    agg = {nt: [] for nt in x_dict}
    for et, ei in edges.items():
        src_t, _, dst_t = et
        ek = edge_key(et)
        k_rel = params[f"k_rel__{ek}"]
        v_rel = params[f"v_rel__{ek}"]
        p_rel = params[f"p_rel__{ek}"]
        k_s = np.einsum("nhd,hde->nhe", k_d[src_t], k_rel)
        v_s = np.einsum("nhd,hde->nhe", v_d[src_t], v_rel)
        src, dst = ei[0], ei[1]
        n_dst = x_dict[dst_t].shape[0]
        logits = (q_d[dst_t][dst] * k_s[src]).sum(-1) * p_rel / np.sqrt(D)
        # segment softmax over dst
        alpha = np.zeros_like(logits)
        out = np.zeros((n_dst, H, D))
        for h in range(H):
            for node in range(n_dst):
                sel = dst == node
                if not sel.any():
                    continue
                l = logits[sel, h]
                e = np.exp(l - l.max())
                a = e / e.sum()
                out[node, h] = (a[:, None] * v_s[src][sel, h]).sum(0)
        agg[dst_t].append(out.reshape(n_dst, F))

    out_dict = {}
    for nt, x in x_dict.items():
        if not agg[nt]:
            out_dict[nt] = x
            continue
        if group == "sum":
            m = np.sum(agg[nt], axis=0)
        g = torch.nn.functional.gelu(torch.from_numpy(m)).numpy()
        o = g @ params[f"out__{nt}"]["kernel"] + params[f"out__{nt}"]["bias"]
        if o.shape[-1] == x.shape[-1]:
            gate = 1 / (1 + np.exp(-params[f"skip__{nt}"]))
            o = gate * o + (1 - gate) * x
        out_dict[nt] = o
    return out_dict


def small_kg(rng, f_in=24):
    node_feats = {
        "drug": rng.randn(10, f_in).astype(np.float32),
        "protein": rng.randn(14, f_in).astype(np.float32),
    }
    edges = {
        ("drug", "interacts", "protein"): np.stack(
            [rng.randint(0, 10, 30), rng.randint(0, 14, 30)]
        ),
        ("protein", "rev_interacts", "drug"): np.stack(
            [rng.randint(0, 14, 30), rng.randint(0, 10, 30)]
        ),
        ("protein", "ppi", "protein"): np.stack(
            [rng.randint(0, 14, 40), rng.randint(0, 14, 40)]
        ),
    }
    return node_feats, edges


def test_hgt_parity(rng):
    node_feats, edges = small_kg(rng)
    batch = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))

    cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4, group="sum")
    model = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
    variables = model.init(
        __import__("jax").random.PRNGKey(0), batch, train=False
    )
    out = model.apply(variables, batch, train=False)

    # numpy oracle with the same params
    p = __import__("jax").tree_util.tree_map(np.asarray, variables["params"])
    x = {k: np.asarray(v) for k, v in node_feats.items()}
    x = torch_hgt_conv(x, edges, p["conv_0"], 4, 16)
    # num_layers=2: no inter-conv relu (reference models.py:90-94)
    x = torch_hgt_conv(x, edges, p["conv_1"], 4, 16)
    ref = (
        x["drug"] @ p["lin__drug"]["kernel"] + p["lin__drug"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(out["drug"]), ref, atol=1e-4,
                               rtol=1e-4)


def test_hgt_edge_padding_invariance(rng):
    node_feats, edges = small_kg(rng)
    cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4)
    model = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
    b1 = build_kg_batch(node_feats, edges, drug_ids=np.arange(10),
                        pad_multiple=64)
    b2 = build_kg_batch(node_feats, edges, drug_ids=np.arange(10),
                        pad_multiple=512)
    variables = model.init(__import__("jax").random.PRNGKey(0), b1,
                           train=False)
    o1 = model.apply(variables, b1, train=False)["drug"]
    o2 = model.apply(variables, b2, train=False)["drug"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_remove_edges_and_lookup(rng):
    node_feats, edges = small_kg(rng)
    pruned = remove_edges_attached_to_drugs(edges, np.array([0, 1]), 10)
    for et, ei in pruned.items():
        src_t, _, dst_t = et
        if src_t == "drug":
            assert not np.isin(ei[0], [0, 1]).any()
        if dst_t == "drug":
            assert not np.isin(ei[1], [0, 1]).any()

    lut = drug_row_lookup(np.array([3, 7, 9]), 12)
    assert lut[3] == 0 and lut[7] == 1 and lut[9] == 2
    assert lut[0] == -1


def _metadata(edges):
    return (["drug", "protein"], [tuple(e) for e in edges])


def test_pyg23_layout_key_exact_and_converter_parity(rng):
    """convert_hgt_pyg23 decodes the EXACT PyG 2.3.x state_dict layout
    (key-set equality enforced) and HGTEncoder(softmax_scope='global')
    reproduces the replica's forward numerics (the reference's env pins
    torch-geometric 2.3.1, whose rewritten HGTConv normalizes attention
    globally across edge types)."""
    import torch as _t

    from madrigal_tpu.interop.convert_checkpoint import convert_hgt_pyg23
    from pyg_hgt_replicas import (
        HGTConvPyG23,
        HGTPyGReplica,
        expected_pyg23_keys,
    )

    node_feats, edges = small_kg(rng, f_in=16)
    metadata = _metadata(edges)
    _t.manual_seed(0)
    replica = HGTPyGReplica(16, 16, 8, 2, 4, metadata, HGTConvPyG23)
    sd = replica.state_dict()
    assert set(sd) == expected_pyg23_keys(metadata[0], metadata[1], 2)

    x_t = {nt: _t.from_numpy(v) for nt, v in node_feats.items()}
    ref = replica(x_t, edges)["drug"].numpy()

    params = convert_hgt_pyg23(sd, metadata[0], metadata[1],
                               num_layers=2, heads=4, hidden=16)
    cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                    softmax_scope="global")
    model = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
    batch = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))
    out = model.apply({"params": params}, batch, train=False)["drug"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_pyg22_layout_key_exact_and_converter_parity(rng):
    """convert_hgt_pyg22 decodes the <=2.2 layout (the group='sum' API the
    reference's code text uses) and the default per-edge-type softmax
    reproduces its forward."""
    import torch as _t

    from madrigal_tpu.interop.convert_checkpoint import convert_hgt_pyg22
    from pyg_hgt_replicas import (
        HGTConvPyG22,
        HGTPyGReplica,
        expected_pyg22_keys,
    )

    node_feats, edges = small_kg(rng, f_in=16)
    metadata = _metadata(edges)
    _t.manual_seed(1)
    replica = HGTPyGReplica(16, 16, 8, 2, 4, metadata, HGTConvPyG22)
    sd = replica.state_dict()
    assert set(sd) == expected_pyg22_keys(metadata[0], metadata[1], 2)

    x_t = {nt: _t.from_numpy(v) for nt, v in node_feats.items()}
    ref = replica(x_t, edges)["drug"].numpy()

    params = convert_hgt_pyg22(sd, metadata[0], metadata[1],
                               num_layers=2, heads=4, hidden=16)
    cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4)  # default scope
    model = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
    batch = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))
    out = model.apply({"params": params}, batch, train=False)["drug"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_pyg23_converter_rejects_wrong_layout(rng):
    """Layout drift (e.g. a 2.2-style checkpoint fed to the 2.3 converter)
    raises KeyError naming the missing keys."""
    import pytest as _pt
    import torch as _t

    from madrigal_tpu.interop.convert_checkpoint import convert_hgt_pyg23
    from pyg_hgt_replicas import HGTConvPyG22, HGTPyGReplica

    node_feats, edges = small_kg(rng, f_in=16)
    metadata = _metadata(edges)
    _t.manual_seed(2)
    replica = HGTPyGReplica(16, 16, 8, 2, 4, metadata, HGTConvPyG22)
    with _pt.raises(KeyError, match="kqv_lin"):
        convert_hgt_pyg23(replica.state_dict(), metadata[0], metadata[1],
                          num_layers=2, heads=4, hidden=16)


def test_convert_reference_encoder_enforces_scope(rng):
    """Decoding a PyG 2.3 HGT layout with a per-edge-type-scope config is
    refused (silent attention-semantics mismatch); softmax_scope='global'
    converts cleanly."""
    import dataclasses

    import pytest as _pt
    import torch as _t

    from madrigal_tpu.config import EncoderConfig
    from madrigal_tpu.interop.convert_checkpoint import (
        convert_reference_encoder,
    )
    from pyg_hgt_replicas import HGTConvPyG23, HGTPyGReplica

    node_feats, edges = small_kg(rng, f_in=16)
    metadata = (["drug", "protein"], [tuple(e) for e in edges])
    _t.manual_seed(3)
    replica = HGTPyGReplica(16, 16, 8, 2, 4, metadata, HGTConvPyG23)
    sd = {f"kg_encoder.{k}": v for k, v in replica.state_dict().items()}

    class Meta:
        node_types = metadata[0]
        edge_types = metadata[1]

    cfg = EncoderConfig(
        feature_dim=8,
        hgt=HGTConfig(hidden_dim=16, num_layers=2, att_heads=4),
    )
    with _pt.raises(ValueError, match="softmax_scope='global'"):
        convert_reference_encoder(sd, cfg, Meta(), strict_kg=True)

    cfg_ok = dataclasses.replace(
        cfg, hgt=HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                           softmax_scope="global"))
    params, _ = convert_reference_encoder(sd, cfg_ok, Meta(),
                                          strict_kg=True)
    assert "kg_encoder" in params and "conv_0" in params["kg_encoder"]


@pytest.mark.slow
def test_hgt_remat_edge_types_matches(rng):
    """remat_edge_types changes memory, not numerics (fwd + grads)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    node_feats, edges = small_kg(rng)
    batch = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))
    cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4)
    cfg_r = dataclasses.replace(cfg, remat_edge_types=True)
    m1 = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
    m2 = HGTEncoder(cfg=cfg_r, embed_dim=8, drug_only_head=True)
    v = m1.init(jax.random.PRNGKey(0), batch, train=False)
    o1 = m1.apply(v, batch, train=False)["drug"]
    o2 = m2.apply(v, batch, train=False)["drug"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    g1 = jax.grad(lambda v: jnp.sum(
        m1.apply(v, batch, train=False)["drug"] ** 2))(v)
    g2 = jax.grad(lambda v: jnp.sum(
        m2.apply(v, batch, train=False)["drug"] ** 2))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_hgt_sorted_edges_matches(rng):
    """build_kg_batch(sort_edges=True) (dst-ordered arenas +
    indices_are_sorted segment lowering) changes layout, not numerics."""
    import dataclasses

    import jax

    node_feats, edges = small_kg(rng)
    kg_u = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))
    kg_s = build_kg_batch(node_feats, edges, drug_ids=np.arange(10),
                          sort_edges=True)
    assert kg_s.metadata.edges_sorted and not kg_u.metadata.edges_sorted
    for scope in ("per_edge_type", "global"):
        cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                        softmax_scope=scope)
        m = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
        v = m.init(jax.random.PRNGKey(0), kg_u, train=False)
        o1 = m.apply(v, kg_u, train=False)["drug"]
        o2 = m.apply(v, kg_s, train=False)["drug"]
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=1e-5, rtol=1e-5)


def test_hgt_bf16_compute_close_to_f32(rng):
    """compute_dtype='bfloat16' (edge-stream throughput mode) stays close
    to the f32 path: bf16 only touches the [E, H, D] message stream;
    softmax statistics and accumulation remain f32. Gradients exist and
    are finite."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    node_feats, edges = small_kg(rng)
    batch = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))
    for scope in ("per_edge_type", "global"):
        cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                        softmax_scope=scope)
        cfg_b = dataclasses.replace(cfg, compute_dtype="bfloat16")
        m1 = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
        m2 = HGTEncoder(cfg=cfg_b, embed_dim=8, drug_only_head=True)
        v = m1.init(jax.random.PRNGKey(0), batch, train=False)
        o1 = np.asarray(m1.apply(v, batch, train=False)["drug"])
        o2 = np.asarray(m2.apply(v, batch, train=False)["drug"])
        assert o2.dtype == np.float32  # accumulation/output stay f32
        scale = np.abs(o1).max()
        assert np.abs(o1 - o2).max() < 0.03 * scale, (scope, o1, o2)

        g = jax.grad(lambda vv: jnp.sum(
            m2.apply(vv, batch, train=False)["drug"] ** 2))(v)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))


def test_hgt_bf16_with_remat_matches_bf16(rng):
    """remat_edge_types composes with compute_dtype='bfloat16'."""
    import dataclasses

    import jax

    node_feats, edges = small_kg(rng)
    batch = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))
    cfg_b = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                      compute_dtype="bfloat16")
    cfg_br = dataclasses.replace(cfg_b, remat_edge_types=True)
    m1 = HGTEncoder(cfg=cfg_b, embed_dim=8, drug_only_head=True)
    m2 = HGTEncoder(cfg=cfg_br, embed_dim=8, drug_only_head=True)
    v = m1.init(jax.random.PRNGKey(0), batch, train=False)
    o1 = m1.apply(v, batch, train=False)["drug"]
    o2 = m2.apply(v, batch, train=False)["drug"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_chunked_arena_layout(rng):
    """Degree-chunked arena: every aligned chunk shares one dst; the
    multiset of (src, dst) over unmasked slots matches the input edges."""
    from madrigal_tpu.data.kg import _chunked_edge_arena

    e = 233
    ei = np.stack([rng.randint(0, 50, e), rng.randint(0, 37, e)])
    src, dst, msk, chunk_dst = _chunked_edge_arena(ei, chunk=8)
    assert src.shape[0] % 8 == 0
    assert chunk_dst.shape[0] == src.shape[0] // 8
    # chunk-constant dst
    d = dst.reshape(-1, 8)
    assert (d == d[:, :1]).all()
    assert (d[:, 0] == chunk_dst).all()
    # masked slots reproduce the original edge multiset
    got = sorted(zip(src[msk].tolist(), dst[msk].tolist()))
    want = sorted(zip(ei[0].tolist(), ei[1].tolist()))
    assert got == want


def test_chunked_segment_ops_match_unchunked(rng):
    """chunked_segment_{sum,softmax} == plain segment ops on the same
    logical edges."""
    import jax.numpy as jnp

    from madrigal_tpu.ops.segment import (
        chunked_segment_softmax,
        chunked_segment_sum,
        segment_softmax,
        segment_sum,
    )

    e, n, c, h = 120, 17, 4, 3
    dst = np.sort(rng.randint(0, n, e)).astype(np.int32)
    data = rng.randn(e, h).astype(np.float32)
    # build the chunked layout by hand: pad each segment to a multiple of c
    rows, cdst, cmask, cdata = [], [], [], []
    for seg in range(n):
        idx = np.where(dst == seg)[0]
        if len(idx) == 0:
            continue
        pad = (-len(idx)) % c
        block = np.concatenate([data[idx],
                                np.zeros((pad, h), np.float32)])
        m = np.concatenate([np.ones(len(idx), bool), np.zeros(pad, bool)])
        cdata.append(block)
        cmask.append(m)
        cdst.extend([seg] * ((len(idx) + pad) // c))
    cdata = np.concatenate(cdata)
    cmask = np.concatenate(cmask)
    cdst = np.asarray(cdst, np.int32)

    ref_sum = segment_sum(jnp.asarray(data), jnp.asarray(dst), n)
    got_sum = chunked_segment_sum(
        jnp.asarray(np.where(cmask[:, None], cdata, 0.0)),
        jnp.asarray(cdst), n, c)
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(ref_sum),
                               atol=1e-5)

    ref_sm = segment_softmax(jnp.asarray(data), jnp.asarray(dst), n)
    got_sm = chunked_segment_softmax(
        jnp.asarray(cdata), jnp.asarray(cmask), jnp.asarray(cdst), n, c)
    # compare per-(segment, head) sorted weights (row order differs)
    for seg in range(n):
        a = np.sort(np.asarray(ref_sm)[dst == seg], axis=0)
        b = np.sort(np.asarray(got_sm)[cmask][cdst.repeat(c)[cmask] == seg],
                    axis=0)
        np.testing.assert_allclose(b, a, atol=1e-5)


@pytest.mark.slow
def test_hgt_chunked_matches_unchunked(rng):
    """build_kg_batch(edge_chunk=8): layout changes, numerics do not
    (fwd + grads, both softmax scopes, with and without remat/bf16)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    node_feats, edges = small_kg(rng)
    kg_u = build_kg_batch(node_feats, edges, drug_ids=np.arange(10))
    kg_c = build_kg_batch(node_feats, edges, drug_ids=np.arange(10),
                          edge_chunk=8)
    assert kg_c.metadata.edge_chunk == 8
    for scope in ("per_edge_type", "global"):
        cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                        softmax_scope=scope)
        m = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
        v = m.init(jax.random.PRNGKey(0), kg_u, train=False)
        o1 = m.apply(v, kg_u, train=False)["drug"]
        o2 = m.apply(v, kg_c, train=False)["drug"]
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=1e-5, rtol=1e-5)

        g1 = jax.grad(lambda vv: jnp.sum(
            m.apply(vv, kg_u, train=False)["drug"] ** 2))(v)
        g2 = jax.grad(lambda vv: jnp.sum(
            m.apply(vv, kg_c, train=False)["drug"] ** 2))(v)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    # remat + chunk composes (per_edge_type scope)
    cfg_r = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                      remat_edge_types=True)
    m_r = HGTEncoder(cfg=cfg_r, embed_dim=8, drug_only_head=True)
    cfg0 = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4)
    m0 = HGTEncoder(cfg=cfg0, embed_dim=8, drug_only_head=True)
    v = m0.init(jax.random.PRNGKey(0), kg_u, train=False)
    o_r = m_r.apply(v, kg_c, train=False)["drug"]
    o_0 = m0.apply(v, kg_u, train=False)["drug"]
    np.testing.assert_allclose(np.asarray(o_r), np.asarray(o_0),
                               atol=1e-5, rtol=1e-5)

    # bf16 + chunk composes
    cfg_b = dataclasses.replace(cfg0, compute_dtype="bfloat16")
    m_b = HGTEncoder(cfg=cfg_b, embed_dim=8, drug_only_head=True)
    o_b = np.asarray(m_b.apply(v, kg_c, train=False)["drug"])
    scale = np.abs(np.asarray(o_0)).max()
    assert np.abs(o_b - np.asarray(o_0)).max() < 0.03 * scale


def test_gather_rows_sorted_transpose_backward(rng):
    """ops/gather.py gather_rows: forward == table[idx]; backward
    (sorted-chunk scatter over the src-transpose arena) == the plain
    gather's transpose, including repeated indices, masked padding rows
    (zero cotangent), and rows never referenced."""
    import jax

    from madrigal_tpu.data.kg import _src_transpose_arena
    from madrigal_tpu.ops.gather import gather_rows

    n, e_real, chunk = 13, 57, 4
    src = np.zeros((72,), np.int32)  # padded arena, budget 72
    msk = np.zeros((72,), bool)
    src[:e_real] = rng.randint(0, n, size=e_real)
    msk[:e_real] = True
    perm, chunk_src = _src_transpose_arena(src, msk, chunk, pad_multiple=8)
    assert perm.shape[0] % chunk == 0
    # every real edge position appears exactly once
    real = perm[perm < 72]
    assert sorted(real.tolist()) == list(range(e_real))

    table = jnp.asarray(rng.randn(n, 6))
    idx = jnp.asarray(src)
    out = gather_rows(table, idx, jnp.asarray(perm),
                      jnp.asarray(chunk_src), chunk)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[src])

    cot = rng.randn(72, 6)
    cot[~msk] = 0.0  # masked edges carry zero cotangent (as in the HGT)
    cot = jnp.asarray(cot)

    g_new = jax.grad(
        lambda t: jnp.vdot(gather_rows(t, idx, jnp.asarray(perm),
                                       jnp.asarray(chunk_src), chunk), cot)
    )(table)
    g_ref = jax.grad(lambda t: jnp.vdot(t[idx], cot))(table)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_hgt_src_arena_backward_matches(rng):
    """build_kg_batch(edge_chunk=8, src_arena=True) carries the opt-in
    source-transpose arenas (measured slower at full scale -- kept as a
    tested option); gradients must match the plain chunked batch tightly
    (same math, reassociated adds), in both softmax scopes and with
    remat."""
    import jax

    node_feats, edges = small_kg(rng)
    kg_a = build_kg_batch(node_feats, edges, drug_ids=np.arange(10),
                          edge_chunk=8, src_arena=True)
    kg_p = build_kg_batch(node_feats, edges, drug_ids=np.arange(10),
                          edge_chunk=8)
    assert kg_a.edge_src_perm and not kg_p.edge_src_perm
    for scope, remat in (("per_edge_type", False), ("global", False),
                         ("per_edge_type", True)):
        cfg = HGTConfig(hidden_dim=16, num_layers=2, att_heads=4,
                        softmax_scope=scope, remat_edge_types=remat)
        m = HGTEncoder(cfg=cfg, embed_dim=8, drug_only_head=True)
        v = m.init(jax.random.PRNGKey(0), kg_p, train=False)

        def loss(vv, kg):
            return jnp.sum(m.apply(vv, kg, train=False)["drug"] ** 2)

        np.testing.assert_allclose(
            np.asarray(m.apply(v, kg_a, train=False)["drug"]),
            np.asarray(m.apply(v, kg_p, train=False)["drug"]),
            rtol=1e-6, atol=1e-7)
        g_a = jax.grad(loss)(v, kg_a)
        g_p = jax.grad(loss)(v, kg_p)
        for a, b in zip(jax.tree_util.tree_leaves(g_a),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
