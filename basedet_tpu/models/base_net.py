"""BaseNet protocol for detection models.

Capability analogue of /root/reference/basedet/models/base_net.py:12-117:
``pre_process → network_forward → get_losses`` (train) /
``inference + post_process`` (eval), plus smart weight loading and deployment
export. TPU-native shape: the flax network module is pure; ``get_losses`` and
``inference`` are jit-compiled functions of (variables, batch); padding/
normalization are static-shape ops; the train/eval distinction is explicit
(no module-global ``self.training`` flag).

Batch dict convention (matches the reference collator,
data/collators/pad_collator.py:23-61, transposed to NHWC):
  data:     (B, H, W, 3) float32 raw BGR pixels
  gt_boxes: (B, K, 5) [x1, y1, x2, y2, class] padded with zeros
  im_info:  (B, 5) [cur_h, cur_w, orig_h, orig_w, num_instances]
Class labels are 1..num_classes; 0 = background.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from basedet_tpu.layers.common.pre_processing import data_to_input
from basedet_tpu.utils import logger


class BaseNet:
    """Base class for detection models (config-driven)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.img_mean = cfg.MODEL.BACKBONE.get("IMG_MEAN", None)
        self.img_std = cfg.MODEL.BACKBONE.get("IMG_STD", None)
        self.num_classes = cfg.DATA.NUM_CLASSES

    # -- to be provided by subclasses ----------------------------------------
    def make_module(self, train: bool):
        """Return the flax module for the network forward pass."""
        raise NotImplementedError

    def get_losses(self, variables, batch, rng=None):
        """(variables, batch) -> (total_loss, loss_dict, mutated_state).

        ``mutated_state`` carries updated mutable collections (batch_stats)
        or {} if none."""
        raise NotImplementedError

    def inference(self, variables, batch):
        """(variables, batch) -> dict of padded detections per image:
        {boxes (B, D, 4), box_scores (B, D), box_labels (B, D),
         valid (B, D)} in original-image coordinates."""
        raise NotImplementedError

    # -- jitted entry points ---------------------------------------------------
    # One compiled (persistently cached) program instead of op-by-op eager
    # dispatch; also what tests should call — eager dispatch is several
    # times slower than a cold jit compile on CPU.
    def get_losses_jit(self, variables, batch, rng=None):
        if not hasattr(self, "_losses_jit"):
            self._losses_jit = jax.jit(self.get_losses)
        return self._losses_jit(variables, batch, rng)

    def inference_jit(self, variables, batch):
        if not hasattr(self, "_inference_jit"):
            self._inference_jit = jax.jit(self.inference)
        return self._inference_jit(variables, batch)

    # -- shared helpers --------------------------------------------------------
    def pre_process(self, batch: Dict[str, Any], train: bool) -> Dict[str, jnp.ndarray]:
        """Pad to x32 + normalize (reference BaseNet.pre_process)."""
        image = batch["data"] if isinstance(batch, dict) else batch
        image = data_to_input(image, self.img_mean, self.img_std)
        out = {"image": image}
        if isinstance(batch, dict) and "im_info" in batch:
            out["img_info"] = jnp.asarray(batch["im_info"])
        else:
            h, w = image.shape[1:3]
            out["img_info"] = jnp.broadcast_to(
                jnp.asarray([h, w, h, w, 0], jnp.float32), (image.shape[0], 5)
            )
        if train:
            out["gt_boxes"] = jnp.asarray(batch["gt_boxes"])
        return out

    def init_variables(self, rng, image_size=(512, 512), batch_size: int = 1):
        module = self.make_module(train=False)
        dummy = jnp.zeros((batch_size, *image_size, 3), jnp.float32)
        # jit: one compiled (and persistently cached) program instead of
        # op-by-op eager dispatch — init dominated CPU test time otherwise
        return jax.jit(module.init)(rng, dummy)

    # -- weights ---------------------------------------------------------------
    def load_weights(self, variables, weight_path: str):
        """Smart-matching weight load (reference utils/checkpoint.py:96)."""
        from basedet_tpu.utils.checkpoint import load_matched_weights

        with open(weight_path, "rb") as f:
            state = pickle.load(f)
        return load_matched_weights(variables, state)

    def dump_static_graph(self, variables, path: str, image_size=(640, 640)):
        """Export the inference graph via jax.export (analogue of
        jit.trace(capture_as_const).dump, base_net.py:94-114)."""
        from jax import export as jax_export

        module = self.make_module(train=False)

        def fwd(image):
            return module.apply(variables, image)

        x = jax.ShapeDtypeStruct((1, *image_size, 3), jnp.float32)
        exported = jax_export.export(jax.jit(fwd))(x)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        logger.info(f"dumped serialized StableHLO graph to {path}")
