"""Dataset/loader behavior: label encoding, missing-code draws, retrieval
substitution, shard/batch mechanics, testing-loader sweep structure."""
import random

import numpy as np
import pytest

from missm_tpu.core.config import MODALITY_CODES
from missm_tpu.data.datasets import DATASET_SPECS, MMDataset, encode_labels
from missm_tpu.data.loaders import BatchLoader
from missm_tpu.data.loaders import testing_loader as make_testing_loader
from missm_tpu.data.loaders import training_loader as make_training_loader
from missm_tpu.data.tokenizer import HashTokenizer
from tests.synthetic import Args, make_mvsa_tree, synthetic_image_loader


@pytest.fixture()
def mvsa(tmp_path):
    csv = make_mvsa_tree(str(tmp_path))
    return csv


def test_encode_labels_sklearn_parity():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.preprocessing import LabelEncoder
    ann = ["pos", "neg", "neu", "pos", "neg"]
    le = LabelEncoder()
    ref = le.fit_transform(ann)
    got, n = encode_labels(ann)
    np.testing.assert_array_equal(got, ref)
    assert n == 3


def test_training_loader_shapes(mvsa):
    args = Args()
    tl, vl, nc = make_training_loader(args, mvsa, HashTokenizer(99, 16),
                                 {"image": synthetic_image_loader()})
    assert nc == 3
    data, labels, missing = next(iter(tl))
    assert data["image"].shape == (4, 3, 32, 32)
    assert data["language"]["input_ids"].shape == (4, 16)
    assert labels.shape == (4,)
    assert (missing == 0).all()  # train_missing=False


def test_train_missing_draws_codes(mvsa):
    args = Args(train_missing=True)
    random.seed(7)
    tl, _, _ = make_training_loader(args, mvsa, HashTokenizer(99, 16),
                               {"image": synthetic_image_loader()})
    codes = set()
    for _ in range(5):
        _, _, missing = next(iter(tl))
        codes.update(missing.tolist())
    assert codes <= {0, MODALITY_CODES["language"], MODALITY_CODES["image"]}
    assert len(codes) > 1


def test_testing_loader_sweep_structure(mvsa):
    args = Args()
    trl, test_loaders, nc = make_testing_loader(args, mvsa, HashTokenizer(99, 16),
                                           {"image": synthetic_image_loader()})
    assert set(test_loaders) == {"language", "image", "mixed"}
    ratios = set(test_loaders["language"].keys())
    assert ratios == {0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9}
    # ratio 0.5: half the 10 test samples carry the language code
    _, _, missing = next(iter(test_loaders["language"][0.5]))
    ds = test_loaders["language"][0.5].dataset
    all_codes = [ds[i][2] for i in range(len(ds))]
    assert sum(c == MODALITY_CODES["language"] for c in all_codes) == 5
    # ratio 0.0 is complete
    ds0 = test_loaders["language"][0.0].dataset
    assert all(ds0[i][2] == 0 for i in range(len(ds0)))


def test_retrieval_substitution(mvsa):
    args = Args(fusion_type="retrieval")
    random.seed(3)
    _, test_loaders, _ = make_testing_loader(args, mvsa, HashTokenizer(99, 16),
                                        {"image": synthetic_image_loader()})
    ds = test_loaders["image"][0.9].dataset
    # all returned codes must be 0 (substitution clears them)
    for i in range(len(ds)):
        raw, label, code = ds[i]
        assert code == 0


def _thread_recording_loader(record):
    import threading

    def load(x):
        record.append(threading.current_thread().name)
        return synthetic_image_loader()(x)
    return load


def test_num_workers_decode_parity(mvsa):
    """num_workers>1 fans the per-batch decode over a thread pool; the
    batches must be identical to the sequential path (decode is pure)."""
    args = Args()
    seq_calls, pool_calls = [], []
    tl0, _, _ = make_training_loader(
        args, mvsa, HashTokenizer(99, 16),
        {"image": _thread_recording_loader(seq_calls)})
    args4 = Args(num_workers=4)
    tl4, _, _ = make_training_loader(
        args4, mvsa, HashTokenizer(99, 16),
        {"image": _thread_recording_loader(pool_calls)})
    for (d0, l0, m0), (d4, l4, m4) in zip(iter(tl0), iter(tl4)):
        np.testing.assert_array_equal(d0["image"], d4["image"])
        np.testing.assert_array_equal(d0["language"]["input_ids"],
                                      d4["language"]["input_ids"])
        np.testing.assert_array_equal(l0, l4)
        np.testing.assert_array_equal(m0, m4)
    assert all("missm-decode" not in n for n in seq_calls)
    assert any("missm-decode" in n for n in pool_calls)


def test_ordered_rng_loader_stays_sequential(mvsa):
    """Loaders tagged ordered_rng (reference_randomness parity runs draw
    from a shared sequential Generator) must decode on the calling
    thread even when num_workers is set."""
    calls = []
    loader = _thread_recording_loader(calls)
    loader.ordered_rng = True
    args = Args(num_workers=4)
    tl, _, _ = make_training_loader(args, mvsa, HashTokenizer(99, 16),
                                    {"image": loader})
    next(iter(tl))
    assert calls and all("missm-decode" not in n for n in calls)


def test_num_workers_decode_error_propagates(mvsa):
    def boom(x):
        raise ValueError("decode failed")
    args = Args(num_workers=2)
    tl, _, _ = make_training_loader(args, mvsa, HashTokenizer(99, 16),
                                    {"image": boom})
    with pytest.raises(ValueError, match="decode failed"):
        next(iter(tl))


def test_reference_randomness_tags_rng_loaders():
    from missm_tpu.core.config import tiny_tower
    from missm_tpu.data.preprocess import make_media_loaders
    cfgs = {"video": tiny_tower("video"), "audio": tiny_tower("audio"),
            "image": tiny_tower("image")}
    tagged = make_media_loaders(cfgs, reference_randomness=True)
    assert getattr(tagged["video"], "ordered_rng", False)
    assert getattr(tagged["audio"], "ordered_rng", False)
    assert not getattr(tagged["image"], "ordered_rng", False)
    plain = make_media_loaders(cfgs, reference_randomness=False)
    assert not getattr(plain["video"], "ordered_rng", False)


def test_shard_split_covers_all():
    spec = DATASET_SPECS["mvsa"]
    import pandas as pd
    df = pd.DataFrame({"ID": range(10),
                       "language": ["t"] * 10,
                       "annotation": ["a"] * 10,
                       "mode": ["train"] * 10})
    labels, _ = encode_labels(df["annotation"])
    ds = MMDataset(spec, df, "/tmp", labels)
    loaders = [BatchLoader(ds, 2, HashTokenizer(99, 8),
                           {"image": synthetic_image_loader()},
                           shuffle=True, num_shards=4, shard_index=i)
               for i in range(4)]
    seen = []
    for ld in loaders:
        seen.extend(ld._shard_indices().tolist())
    # wrap-around padding: 12 slots over 10 samples, all samples covered
    assert len(seen) == 12
    assert set(seen) == set(range(10))
    # same fixed permutation every epoch (reference never set_epoch)
    a = loaders[0]._shard_indices()
    loaders[0].set_epoch(0)
    np.testing.assert_array_equal(a, loaders[0]._shard_indices())
