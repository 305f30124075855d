"""Golden parity against the REFERENCE'S OWN fusion-head code.

`baseline.py` is executed from its read-only mount (tests/ref_shim.py) with
my JAX head parameters copied into the torch modules; outputs must match
the JAX heads bit-near for every (head, missing-mask) combination. The two
graph heads are excluded (torch_geometric is not installed); their
semantics are pinned separately in test_fusion.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from missm_tpu.core.config import MODALITY_CODES
from missm_tpu.models.fusion import (FusionConfig, fusion_forward,
                                     init_fusion, set_statistics)
from tests.ref_shim import load_reference_baseline

MODS = ("language", "video", "audio")
B, FEAT, FDIM, OUT = 6, 16, 8, 3


class _Args:
    modality_types = list(MODS)
    feature_dims = FEAT
    fusion_dim = FDIM
    dropout_prob = 0.1


def _cfg(ftype):
    return FusionConfig(fusion_type=ftype, modality_types=MODS,
                        output_dims=OUT, feature_dims=FEAT, fusion_dim=FDIM)


def _t(x):
    return torch.tensor(np.asarray(x))


def _copy_linear(torch_lin, p):
    with torch.no_grad():
        torch_lin.weight.copy_(_t(p["w"]).T)
        if torch_lin.bias is not None and "b" in p:
            torch_lin.bias.copy_(_t(p["b"]))


def _copy_ln(torch_ln, p):
    with torch.no_grad():
        torch_ln.weight.copy_(_t(p["scale"]))
        torch_ln.bias.copy_(_t(p["bias"]))


def _copy_head(torch_head, p):
    _copy_linear(torch_head.head[0], p["fc1"])
    _copy_linear(torch_head.head[3], p["fc2"])


def _copy_projs(torch_mod, p):
    for m in MODS:
        _copy_linear(torch_mod.modal_proj[m], p["proj"][m])


def _embeds(seed=0):
    rng = np.random.default_rng(seed)
    return {m: rng.standard_normal((B, FEAT)).astype(np.float32)
            for m in MODS}


def _missing():
    return np.asarray([0, 1, 2, 3, 0, 2], np.int32)


def _run_ref(module, embeds, missing):
    batch = {m: _t(v.copy()) for m, v in embeds.items()}
    with torch.no_grad():
        out = module(batch, _t(missing))
    return out


def _assert_match(ref_logits, got_logits):
    np.testing.assert_allclose(np.asarray(got_logits),
                               ref_logits.detach().numpy(), atol=2e-5,
                               rtol=1e-4)


@pytest.fixture(scope="module")
def ref():
    return load_reference_baseline()


def _jax_out(ftype, params, embeds, missing):
    out, aux = fusion_forward(params, _cfg(ftype),
                              {m: jnp.asarray(v) for m, v in embeds.items()},
                              jnp.asarray(missing))
    return out, aux


def test_sum_parity(ref):
    params = init_fusion(jax.random.PRNGKey(0), _cfg("sum"))
    mod = ref.modal_sum(_Args(), OUT).eval()
    _copy_projs(mod, params)
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    embeds, missing = _embeds(), _missing()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("sum", params, embeds, missing)[0])


def test_concat_parity_with_statistics(ref):
    params = init_fusion(jax.random.PRNGKey(1), _cfg("concat"))
    stats = {m: np.random.default_rng(9).standard_normal(FEAT)
             .astype(np.float32) for m in MODS}
    params = set_statistics(params, stats)
    mod = ref.modal_concat(_Args(), OUT).eval()
    _copy_projs(mod, params)
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    mod.set_statistics({m: stats[m].tolist() for m in MODS}, list(MODS))
    embeds, missing = _embeds(1), _missing()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("concat", params, embeds, missing)[0])


def test_regression_parity(ref):
    params = init_fusion(jax.random.PRNGKey(2), _cfg("regression"))
    mod = ref.modal_regression(_Args(), OUT).eval()
    _copy_projs(mod, params)
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    for s in MODS:
        for t in MODS:
            if s != t:
                key = f"{s}_to_{t}"
                _copy_linear(mod.cross_modal_regressors[key],
                             params["regressors"][key])
    embeds, missing = _embeds(2), _missing()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("regression", params, embeds, missing)[0])


def test_retrieval_parity(ref):
    params = init_fusion(jax.random.PRNGKey(3), _cfg("retrieval"))
    mod = ref.modal_concat_full(_Args(), OUT).eval()
    _copy_projs(mod, params)
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    embeds, missing = _embeds(3), _missing()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("retrieval", params, embeds, missing)[0])


def test_intra_attention_parity(ref):
    params = init_fusion(jax.random.PRNGKey(4), _cfg("intra_attention"))
    mod = ref.modal_intra_channel_attention(_Args(), OUT).eval()
    _copy_projs(mod, params)
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    with torch.no_grad():
        mod.fusion_representation.copy_(_t(params["fusion_representation"]))
    _copy_linear(mod.channel_attention[0], params["gate_fc1"])
    _copy_linear(mod.channel_attention[2], params["gate_fc2"])
    embeds, missing = _embeds(4), _missing()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("intra_attention", params, embeds, missing)[0])


def test_inter_attention_parity(ref):
    params = init_fusion(jax.random.PRNGKey(5), _cfg("inter_attention"))
    mod = ref.modal_inter_attention(_Args(), OUT).eval()
    _copy_projs(mod, params)
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    with torch.no_grad():
        mod.query_token.copy_(_t(params["query_token"]))
        wq = np.asarray(params["attn"]["q"]["w"]).T
        wk = np.asarray(params["attn"]["k"]["w"]).T
        wv = np.asarray(params["attn"]["v"]["w"]).T
        mod.attn.in_proj_weight.copy_(_t(np.concatenate([wq, wk, wv])))
        mod.attn.in_proj_bias.copy_(_t(np.concatenate(
            [np.asarray(params["attn"][x]["b"]) for x in ("q", "k", "v")])))
        mod.attn.out_proj.weight.copy_(
            _t(np.asarray(params["attn"]["out"]["w"]).T))
        mod.attn.out_proj.bias.copy_(_t(params["attn"]["out"]["b"]))
    embeds, missing = _embeds(5), _missing()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("inter_attention", params, embeds, missing)[0])


def test_dedicated_dnn_parity(ref):
    params = init_fusion(jax.random.PRNGKey(6), _cfg("dedicated_dnn"))
    mod = ref.modal_dedicated_dnn(_Args(), OUT).eval()
    for m in list(MODS) + ["full"]:
        _copy_linear(mod.dedicated_dnn[m], params["branches"][m])
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    embeds, missing = _embeds(6), _missing()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("dedicated_dnn", params, embeds, missing)[0])


def test_distillation_parity(ref):
    params = init_fusion(jax.random.PRNGKey(7), _cfg("Distill_tea"))
    mod = ref.modal_distillation(_Args(), OUT).eval()
    _copy_linear(mod.modal_proj[0], {"w": params["mlp_fc1"]["w"],
                                     "b": params["mlp_fc1"]["b"]})
    _copy_linear(mod.modal_proj[2], {"w": params["mlp_fc2"]["w"],
                                     "b": params["mlp_fc2"]["b"]})
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    embeds, missing = _embeds(7), _missing()
    batch = {m: _t(v.copy()) for m, v in embeds.items()}
    with torch.no_grad():
        ref_feats, ref_logits = mod(batch, _t(missing))
    got_logits, aux = _jax_out("Distill_tea", params, embeds, missing)
    _assert_match(ref_logits, got_logits)
    np.testing.assert_allclose(np.asarray(aux["features"]),
                               ref_feats.numpy(), atol=1e-6)


def test_self_distill_parity_eval_and_train(ref):
    params = init_fusion(jax.random.PRNGKey(8), _cfg("self_distill"))
    mod = ref.modal_self_distillation(_Args(), OUT)
    _copy_linear(mod.modal_proj[0], {"w": params["mlp_fc1"]["w"],
                                     "b": params["mlp_fc1"]["b"]})
    _copy_linear(mod.modal_proj[2], {"w": params["mlp_fc2"]["w"],
                                     "b": params["mlp_fc2"]["b"]})
    _copy_ln(mod.norm, params["norm"])
    _copy_head(mod.head, params["head"])
    embeds, missing = _embeds(8), _missing()

    mod.eval()
    _assert_match(_run_ref(mod, embeds, missing),
                  _jax_out("self_distill", params, embeds, missing)[0])

    # train mode: compare the distillation tensors too (dropout only lives
    # in the head, which is bypassed for the aux outputs)
    mod.train()
    batch = {m: _t(v.copy()) for m, v in embeds.items()}
    with torch.no_grad():
        masks, stu, tea, _logits = mod(batch, _t(missing))
    cfg = _cfg("self_distill")
    out, aux = fusion_forward(
        params, cfg, {m: jnp.asarray(v) for m, v in embeds.items()},
        jnp.asarray(missing), train=True, rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(aux["tea_features"]), tea.numpy(),
                               atol=2e-6)
    for i in range(len(MODS)):
        np.testing.assert_allclose(np.asarray(aux["stu_features"][:, i]),
                                   stu[i].numpy(), atol=2e-6)
        np.testing.assert_array_equal(np.asarray(aux["present_masks"][:, i]),
                                      masks[i].numpy())
