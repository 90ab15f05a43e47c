"""Reference-side activation dump script — run this in a MegEngine
environment with the reference basedet installed (NOT runnable here; this
sandbox has no MegEngine). Parity-day recipe:

  (ref env)  python ref_dump_activations.py -f <ref config.py> \
                 -w <zoo.pkl> --image probe.npy -o ref_acts.pkl
  (here)     python -m basedet_tpu.tools.parity_diff dump \
                 -f playground/retinanet_r50_1x/config.py -w <converted.pkl> \
                 --image probe.npy -o ours.pkl
             python -m basedet_tpu.tools.parity_diff diff ours.pkl ref_acts.pkl

Both dumps must be fed the SAME probe.npy (H, W, 3) float32 raw-pixel image
(make one with: np.save("probe.npy", np.random.RandomState(0).randint(
0, 256, (512, 512, 3)).astype("float32"))). The differ auto-transposes the
reference's NCHW arrays and matches stage names case-insensitively.

Stage-name contract (what tools/parity_diff.py canonicalizes to):
  res2..res5   trunk stage outputs   (ref: model.backbone.bottom_up(...))
  p3..p7       FPN levels (dict keys on both sides)
  head/...     head subnet outputs; head.0.i / head.1.i = per-level
               cls / bbox predictor maps, ascending stride
Extra per-block seams on either side are fine — the differ compares the
intersection and lists one-sided keys.
"""
import argparse
import pickle

import numpy as np


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("-f", "--config", required=True)
    p.add_argument("-w", "--weights", required=True)
    p.add_argument("--image", required=True, help=".npy (H,W,3) raw pixels")
    p.add_argument("-o", "--out", required=True)
    args = p.parse_args()

    import megengine as mge

    from basedet.layers import feature_extract  # ref module_inspector
    from basedet.utils.registry import all_register

    all_register()
    # reference user-config protocol: config.py defines class Cfg
    import importlib.util
    spec = importlib.util.spec_from_file_location("user_config", args.config)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = mod.Cfg()

    from basedet.models import build_model  # or cfg-driven factory
    model = build_model(cfg)
    model.load_state_dict(mge.load(args.weights)["state_dict"], strict=False)
    model.eval()

    image = np.load(args.image)
    if image.ndim == 3:
        image = image[None]
    tensor = mge.tensor(image.transpose(0, 3, 1, 2))  # NHWC file → NCHW

    acts = {}
    # hook the three seams; feature_extract yields {module_name: output}
    with feature_extract(model, ["backbone.bottom_up", "backbone", "head"]) \
            as features:
        inputs = {"data": tensor, "im_info": mge.tensor(
            [[image.shape[1], image.shape[2],
              image.shape[1], image.shape[2], 0]] * image.shape[0])}
        model.inference(inputs) if hasattr(model, "inference") else model(inputs)

    def put(name, val):
        if isinstance(val, dict):
            for k, v in val.items():
                put(str(k), v)
        elif isinstance(val, (list, tuple)):
            for i, v in enumerate(val):
                put(f"{name}.{i}", v)
        else:
            acts[name] = np.ascontiguousarray(val.numpy())

    for name, out in features.items():
        short = {"backbone.bottom_up": "bottom_up",
                 "backbone": "fpn"}.get(name, name)
        put(short, out)

    with open(args.out, "wb") as f:
        pickle.dump({"activations": acts, "input": image,
                     "meta": {"side": "reference", "config": args.config}}, f)
    print(f"dumped {len(acts)} stages to {args.out}")


if __name__ == "__main__":
    main()
