"""statistics_pass exactness (reference test.py:97-115 +
calculate_statistics:54-61): the batched, final-batch-padded pass must
produce EXACTLY np.mean / np.median over the full train set's
embeddings — covering the median branch (previously only mean ran, via
the e2e sweeps) and the pad-then-slice bookkeeping with a ragged final
batch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.eval.sweep import statistics_pass
from missm_tpu.models.finetune import embed_only
from tests.test_eval_parity import ListLoader, _tiny_setup


@pytest.mark.parametrize("stat", ["mean", "median"])
def test_statistics_pass_matches_full_aggregate(stat):
    N, BS = 11, 4  # 3 batches, last one ragged (3 rows)
    cfg, params, data, labels, missing = _tiny_setup(n=N, seed=6)
    loader = ListLoader(data, labels, missing, batch_size=BS)

    got = statistics_pass(params, cfg, loader, stat)

    full = embed_only(params, cfg, {k: jnp.asarray(v)
                                    for k, v in data.items()})
    agg = np.mean if stat == "mean" else np.median
    for m in cfg.fusion.modality_types:
        want = agg(np.asarray(full[m]), axis=0)
        np.testing.assert_allclose(np.asarray(got[m]), want,
                                   atol=1e-6, rtol=1e-5, err_msg=m)
        assert got[m].shape == (cfg.fusion.feature_dims,)
