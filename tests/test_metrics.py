"""sklearn parity for accuracy / macro-F1 / AUC-ovo."""
import numpy as np
import pytest

from missm_tpu.metrics import accuracy, auc_ovo, macro_f1

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import accuracy_score, f1_score, roc_auc_score


@pytest.mark.parametrize("n_classes", [2, 3, 6])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity(n_classes, seed):
    rng = np.random.default_rng(seed)
    n = 200
    labels = rng.integers(0, n_classes, n)
    logits = rng.standard_normal((n, n_classes))
    # bias towards the true class so AUC is nontrivial
    logits[np.arange(n), labels] += 1.0
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    preds = probs.argmax(1)

    assert accuracy(labels, preds) == pytest.approx(
        accuracy_score(labels, preds))
    assert macro_f1(labels, preds) == pytest.approx(
        f1_score(labels, preds, average="macro"))
    if n_classes == 2:
        ref = roc_auc_score(labels, probs[:, 1])
    else:
        ref = roc_auc_score(labels, probs, multi_class="ovo")
    assert auc_ovo(labels, probs) == pytest.approx(ref, abs=1e-10)


def test_ties_and_missing_classes():
    labels = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 0, 1, 1, 1, 1])  # class 2 never predicted
    assert macro_f1(labels, preds) == pytest.approx(
        f1_score(labels, preds, average="macro"))
    probs = np.full((6, 3), 1 / 3.0)  # all tied
    ref = roc_auc_score(labels, probs, multi_class="ovo")
    assert auc_ovo(labels, probs) == pytest.approx(ref)
