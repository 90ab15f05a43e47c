"""Evaluation CLI (reference tools/det_test.py:40-118): load weights (or the
last checkpoint), run the COCO evaluator, optionally evaluate EMA weights."""
from __future__ import annotations

import os
import pickle

import jax

from basedet_tpu.data.build import build_test_dataloader
from basedet_tpu.utils import all_register, logger, setup_logger

from .misc import apply_common_flags, default_parser, import_config


def load_eval_variables(cfg, model, weights_path=None, use_ema=False):
    """Reference semantics: explicit weights, else GLOBAL.CKPT_SAVE_DIR's
    last_checkpoint (det_test.py:58-67)."""
    if weights_path is None:
        ckpt_dir = cfg.GLOBAL.CKPT_SAVE_DIR
        pointer = os.path.join(ckpt_dir, "last_checkpoint")
        with open(pointer) as f:
            name = f.read().strip()
        weights_path = os.path.join(ckpt_dir, name)
    with open(weights_path, "rb") as f:
        payload = pickle.load(f)
    if "state" in payload:
        state = payload["state"]
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        return {"params": params, **state.model_state}
    from basedet_tpu.utils.checkpoint import load_matched_weights

    variables = model.init_variables(jax.random.PRNGKey(0))
    return load_matched_weights(variables, payload)


def main(args=None):
    parser = default_parser("basedet_tpu test")
    parser.add_argument("--eval-ema", action="store_true")
    args = parser.parse_args(args)
    all_register()
    cfg = import_config(args.file)
    apply_common_flags(cfg, args)
    cfg.MODEL.BATCHSIZE = 1  # reference forces bs=1 (det_test.py:44-45)

    setup_logger(cfg.GLOBAL.OUTPUT_DIR, file_prefix="test_log")
    model = cfg.build_model()
    evaluator = cfg.build_evaluator()
    dataloader = build_test_dataloader(cfg)

    variables = load_eval_variables(cfg, model, args.weights)
    results = evaluator.evaluate_model(model, variables, dataloader)
    logger.info(f"eval results: {results}")
    if args.eval_ema:
        variables = load_eval_variables(cfg, model, args.weights, use_ema=True)
        results_ema = evaluator.evaluate_model(model, variables, dataloader)
        logger.info(f"eval results (EMA): {results_ema}")
    return results


if __name__ == "__main__":
    main()
