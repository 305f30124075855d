"""Property-based fuzzing of the fusion heads' mask invariants
(VERDICT r4 #8): all 12 heads x random within-spec missing-code vectors
x random embeddings, across three dataset modality sets — the fixed
single-pattern checks in test_fusion.py generalized to drawn inputs.

Properties:
1. row locality / permutation equivariance (ALL heads): sample i's
   logits depend only on row i's embeddings and code, so permuting the
   batch permutes the logits — a head that leaks across rows (a wrong
   axis in an attention/graph reduction) fails for some drawn mask.
2. missing-content invariance (the heads that zero/replace/mask missing
   embeddings; the graph heads are excluded by the preserved self-loop
   leak, test_fusion.py): scribbling arbitrary drawn values over every
   missing row's embedding never changes any logit.

Shapes are fixed per (head, modality-set) test id so jit caches across
hypothesis examples; codes/embeddings/scribbles are drawn as traced
values."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from missm_tpu.core.config import MODALITY_CODES
from missm_tpu.models.fusion import (FUSION_TYPES, FusionConfig,
                                     fusion_forward, init_fusion)

B, FEAT = 6, 16

# the benchmark datasets' modality sets (data_loader.py:56-264)
MODSETS = {
    "sims_mosi": ("language", "video", "audio"),
    "enterface": ("video", "audio"),
    "mvsa": ("language", "image"),
}

INVARIANT = ("sum", "concat", "regression", "intra_attention",
             "inter_attention", "dedicated_dnn", "Distill_tea", "MTD_stu",
             "KL_stu", "self_distill")


def _setup(ftype, mods):
    cfg = FusionConfig(fusion_type=ftype, modality_types=mods,
                       output_dims=3, feature_dims=FEAT, fusion_dim=8,
                       dropout_prob=0.1)
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _draw_batch(data, mods):
    rng = np.random.default_rng(data.draw(st.integers(0, 2 ** 31 - 1)))
    embeds = {m: jnp.asarray(rng.standard_normal((B, FEAT)), jnp.float32)
              for m in mods}
    codes = [0] + [MODALITY_CODES[m] for m in mods]
    missing = jnp.asarray(
        [data.draw(st.sampled_from(codes)) for _ in range(B)], jnp.int32)
    return rng, embeds, missing


@settings(max_examples=12, deadline=None)
@given(data=st.data())
@pytest.mark.parametrize("modset", sorted(MODSETS))
@pytest.mark.parametrize("ftype", FUSION_TYPES)
def test_fuzz_permutation_equivariance(ftype, modset, data):
    mods = MODSETS[modset]
    cfg, params = _setup(ftype, mods)
    rng, embeds, missing = _draw_batch(data, mods)
    perm = rng.permutation(B)
    out, _ = fusion_forward(params, cfg, embeds, missing)
    out_p, _ = fusion_forward(
        params, cfg, {m: v[perm] for m, v in embeds.items()},
        missing[perm])
    assert np.isfinite(np.asarray(out)).all(), (ftype, modset)
    np.testing.assert_allclose(np.asarray(out)[perm], np.asarray(out_p),
                               atol=1e-5, rtol=1e-5,
                               err_msg=f"{ftype}/{modset}")


@settings(max_examples=12, deadline=None)
@given(data=st.data())
@pytest.mark.parametrize("modset", sorted(MODSETS))
@pytest.mark.parametrize("ftype", INVARIANT)
def test_fuzz_missing_content_invariance(ftype, modset, data):
    mods = MODSETS[modset]
    cfg, params = _setup(ftype, mods)
    _, embeds, missing = _draw_batch(data, mods)
    out1, _ = fusion_forward(params, cfg, embeds, missing)
    scribble = data.draw(st.floats(-1e4, 1e4, allow_nan=False))
    embeds2 = dict(embeds)
    for m in mods:
        mask = np.asarray(missing) == MODALITY_CODES[m]
        e = np.asarray(embeds2[m]).copy()
        e[mask] = scribble
        embeds2[m] = jnp.asarray(e)
    out2, _ = fusion_forward(params, cfg, embeds2, missing)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, err_msg=f"{ftype}/{modset}")
