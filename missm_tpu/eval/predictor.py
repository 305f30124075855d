"""Serving-style inference API.

`Predictor` wraps a trained model for production use: load the final
checkpoint once, jit the forward once per input shape, then serve batched
predictions (labels + probabilities) for raw media paths/texts or
pre-encoded arrays. Partial batches are padded to the compiled batch size
(one executable, no recompiles).
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.finetune import ModelConfig, model_forward


class Predictor:
    def __init__(self, params, cfg: ModelConfig, batch_size: int = 32,
                 tokenizer=None,
                 media_loaders: Optional[Dict[str, Callable]] = None,
                 device_put: Callable = lambda x: x):
        # commit params to device ONCE: from_checkpoint restores a host
        # numpy tree, and numpy jit arguments re-upload on every call —
        # for the ViT-L towers over the 13-124 MB/s axon tunnel that is
        # tens of seconds of H2D per predict() otherwise.
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.media_loaders = media_loaders or {}
        self.device_put = device_put

        @jax.jit
        def _predict(params, data, missing_index):
            logits, _ = model_forward(params, cfg, data, missing_index,
                                      train=False)
            probs = jax.nn.softmax(logits, axis=-1)
            return {"probs": probs, "preds": jnp.argmax(logits, axis=-1)}

        self._predict = _predict

    @classmethod
    def from_checkpoint(cls, path: str, cfg: ModelConfig, **kw):
        from ..train.checkpoint import restore_checkpoint
        tree, _ = restore_checkpoint(path)
        return cls(tree["params"], cfg, **kw)

    def _collate_raw(self, samples: Sequence[Mapping]):
        """samples: list of {modality: path-or-text}. -> batched arrays."""
        data = {}
        for m in self.cfg.fusion.modality_types:
            col = [s[m] for s in samples]
            if m == "language":
                data[m] = self.tokenizer(list(col))
            else:
                data[m] = np.stack([np.asarray(self.media_loaders[m](x))
                                    for x in col])
        return data

    def predict_arrays(self, data: Mapping, missing_index=None):
        """data: {modality: batched array}; returns (preds, probs) numpy,
        truncated to the true batch length."""
        from .sweep import _pad_batch

        n = len(next(iter(
            v["input_ids"] if isinstance(v, Mapping) else v
            for v in data.values())))
        target = self.batch_size
        if n > target:
            raise ValueError(
                f"predict_arrays got a batch of {n} rows but the compiled "
                f"batch_size is {target}; use predict() (which chunks) or "
                f"construct the Predictor with a larger batch_size")

        data = _pad_batch({k: np.asarray(v) if not isinstance(v, Mapping)
                           else v for k, v in data.items()}, target)
        if missing_index is None:
            missing_index = np.zeros((target,), np.int32)
        else:
            missing_index = _pad_batch(np.asarray(missing_index, np.int32),
                                       target)
        out = self._predict(self.params, self.device_put(data),
                            jnp.asarray(missing_index))
        return (np.asarray(out["preds"])[:n], np.asarray(out["probs"])[:n])

    def predict(self, samples: Sequence[Mapping], missing_index=None):
        """Raw samples -> (preds, probs), chunked by the compiled batch."""
        preds, probs = [], []
        bs = self.batch_size
        for i in range(0, len(samples), bs):
            chunk = samples[i:i + bs]
            data = self._collate_raw(chunk)
            mi = (None if missing_index is None
                  else missing_index[i:i + bs])
            p, pr = self.predict_arrays(data, mi)
            preds.append(p)
            probs.append(pr)
        return np.concatenate(preds), np.concatenate(probs)
