"""Activation parity harness: dump per-stage forward activations of a model
to a pickle, and diff two such dumps layer-by-layer with tolerance reporting.

Purpose (parity day): when a MegEngine runtime + reference zoo weights become
available, a per-stage activation dump from the reference (see
``playground/ref_dump_activations.py`` for the script to run on that side)
can be diffed against this framework's activations on the SAME input pixels
in one command, localizing any numeric divergence to the first offending
stage (stem → res2..res5 → FPN p3..p7 → head outputs). Reference forward
seams: /root/reference/basedet/models/base_net.py:50-117 (pre_process →
network → head), layers/common/module_inspector.py feature_extract.

Usage:
  dump:  python -m basedet_tpu.tools.parity_diff dump -f <config.py>
             [-w ckpt.pkl] [--image img.npy] [--size 512] -o ours.pkl
  diff:  python -m basedet_tpu.tools.parity_diff diff ours.pkl ref.pkl
             [--rtol 1e-4] [--atol 1e-4] [--order stem,res2,...]

Dump format (both sides must follow it):
  {"activations": {name: np.ndarray}, "input": np.ndarray | None,
   "meta": {...}}
Rank-4 reference arrays may be NCHW; the differ auto-transposes whichever
side is NCHW to NHWC when shapes only agree under that permutation.
"""
from __future__ import annotations

import argparse
import pickle
from typing import Dict, Optional

import numpy as np


# -- canonicalization ----------------------------------------------------------


def canonical_name(key: str) -> str:
    """Normalize a capture path to a comparable stage name: strip flax
    ``__call__`` suffixes and container indices glue, lowercase."""
    k = key.replace("/__call__", "")
    k = k.strip("/").lower()
    if k == "__call__":  # the top module's own output
        k = "output"
    # common aliases between the two frameworks' naming
    for pre in ("backbone/bottom_up/", "bottom_up/", "backbone/"):
        if k.startswith(pre):
            k = k[len(pre):]
            break
    return k


def _flatten_containers(acts: Dict[str, object]) -> Dict[str, np.ndarray]:
    """Expand dict/list/tuple activation values into scalar-array entries:
    ``fpn -> [p3, p4, ...]`` becomes ``fpn.0, fpn.1, ...``; dict values keep
    their own keys (``bottom_up -> {res2: ...}`` becomes ``res2...``)."""
    flat: Dict[str, np.ndarray] = {}

    def add(name, val):
        if isinstance(val, dict):
            for k, v in val.items():
                add(str(k), v)  # dict keys (res2..) ARE the stage names
        elif isinstance(val, (list, tuple)):
            for i, v in enumerate(val):
                add(f"{name}.{i}", v)
        else:
            arr = np.asarray(val)
            if str(arr.dtype) == "bfloat16" or arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            flat[name] = arr

    for k, v in acts.items():
        add(canonical_name(k), v)
    return flat


def _to_nhwc(a: np.ndarray, b: np.ndarray):
    """If rank-4 shapes only agree under NCHW→NHWC on one side, transpose
    that side (reference dumps are NCHW; ours NHWC)."""
    if a.ndim == b.ndim == 4 and a.shape != b.shape:
        if a.shape == (b.shape[0], b.shape[3], b.shape[1], b.shape[2]):
            return a.transpose(0, 2, 3, 1), b
        if b.shape == (a.shape[0], a.shape[3], a.shape[1], a.shape[2]):
            return a, b.transpose(0, 2, 3, 1)
    return a, b


# -- dump ----------------------------------------------------------------------


def dump_activations(model, variables, image: np.ndarray,
                     capture=("bottom_up", "fpn", "head", "backbone")):
    """Forward ``image`` (B, H, W, 3 raw pixels) through the model's eval
    module capturing the named top-level seams; returns {stage: np.ndarray}.
    """
    from basedet_tpu.layers.common.module_inspector import feature_extract

    module = model.make_module(train=False)
    inputs = model.pre_process({"data": image}, train=False)

    def filter_fn(mdl, _method):
        path = "/".join(str(p) for p in mdl.path)
        depth = len(mdl.path)
        return depth <= 1 or any(c in path for c in capture)

    _, flat = feature_extract(
        module, variables, inputs["image"], filter_fn=filter_fn
    )
    return _flatten_containers(flat)


def _cmd_dump(args):
    import jax

    if args.backend:
        # This environment's site hook re-registers the axon TPU plugin
        # regardless of JAX_PLATFORMS in the process env, so the env var
        # alone cannot select a backend here — only a post-import
        # jax.config.update is authoritative (same pattern as
        # tests/conftest.py). Without this, a "CPU" dump silently runs
        # on the TPU and a CPU-vs-TPU diff compares the chip to itself.
        jax.config.update("jax_platforms", args.backend)

    from basedet_tpu.tools.misc import import_config
    from basedet_tpu.utils import all_register

    all_register()
    cfg = import_config(args.config) if args.config else None
    if cfg is None:
        from basedet_tpu.configs import RetinaNetConfig

        cfg = RetinaNetConfig()
    if args.opts:
        cfg.merge(args.opts)
    model = cfg.build_model()

    if args.image:
        image = np.load(args.image)
        if image.ndim == 3:
            image = image[None]
    else:
        rng = np.random.RandomState(0)
        image = rng.randint(
            0, 256, (1, args.size, args.size, 3)
        ).astype(np.float32)

    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=image.shape[1:3]
    )
    if args.weights:
        variables = model.load_weights(variables, args.weights)

    if args.precision:
        # TPU f32 convs default to single-pass bf16 on the MXU — fine for
        # training, but it dominates a cross-backend activation diff
        # (measured: max_abs up to 0.22 on RetinaNet FPN outputs vs CPU at
        # default precision). "highest" forces f32-accurate passes so the
        # diff bounds true numeric drift instead of the matmul mode.
        with jax.default_matmul_precision(args.precision):
            acts = dump_activations(model, variables, image)
    else:
        acts = dump_activations(model, variables, image)
    acts = {k: np.asarray(jax.device_get(v)) for k, v in acts.items()}
    payload = {
        "activations": acts,
        "input": image,
        "meta": {
            "config": args.config,
            "weights": args.weights,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "matmul_precision": args.precision or "default",
        },
    }
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"dumped {len(acts)} stages to {args.out}:")
    for k, v in acts.items():
        print(f"  {k}: {tuple(v.shape)} {v.dtype}")


# -- diff ----------------------------------------------------------------------


def diff_dumps(ours: Dict, ref: Dict, rtol=1e-4, atol=1e-4,
               order: Optional[list] = None):
    """Compare two {stage: array} dicts. Returns (report_rows, ok)."""
    a_all = _flatten_containers(ours)
    b_all = _flatten_containers(ref)
    common = sorted(set(a_all) & set(b_all))
    if order:
        rank = {n: i for i, n in enumerate(order)}
        common.sort(key=lambda k: (rank.get(k, len(rank)), k))
    rows, ok = [], True
    for k in common:
        a, b = _to_nhwc(a_all[k], b_all[k])
        if a.shape != b.shape:
            rows.append(dict(stage=k, status="SHAPE-MISMATCH",
                             ours=tuple(a.shape), ref=tuple(b.shape)))
            ok = False
            continue
        a64 = a.astype(np.float64)
        b64 = b.astype(np.float64)
        max_abs = float(np.max(np.abs(a64 - b64))) if a.size else 0.0
        denom = np.abs(b64) + 1e-12
        max_rel = float(np.max(np.abs(a64 - b64) / denom)) if a.size else 0.0
        # scale-aware drift: max_abs relative to the stage's own spread.
        # max_rel explodes near zero crossings; this is the per-stage
        # tolerance number parity day should budget against.
        std = float(np.std(b64)) if a.size else 0.0
        abs_over_std = max_abs / (std + 1e-12)
        close = bool(np.allclose(a64, b64, rtol=rtol, atol=atol))
        rows.append(dict(stage=k, status="OK" if close else "DIVERGED",
                         max_abs=max_abs, max_rel=max_rel,
                         abs_over_std=abs_over_std, shape=tuple(a.shape)))
        ok = ok and close
    for k in sorted(set(a_all) - set(b_all)):
        rows.append(dict(stage=k, status="OURS-ONLY"))
    for k in sorted(set(b_all) - set(a_all)):
        rows.append(dict(stage=k, status="REF-ONLY"))
    return rows, ok


def _cmd_diff(args):
    with open(args.ours, "rb") as f:
        ours = pickle.load(f)
    with open(args.ref, "rb") as f:
        ref = pickle.load(f)
    meta_a = ours.get("meta", {}) if isinstance(ours, dict) else {}
    meta_b = ref.get("meta", {}) if isinstance(ref, dict) else {}
    if meta_a.get("device") or meta_b.get("device"):
        print(f"ours: backend={meta_a.get('backend')} "
              f"device={meta_a.get('device')}")
        print(f"ref:  backend={meta_b.get('backend')} "
              f"device={meta_b.get('device')}")
        if meta_a.get("device") and meta_a.get("device") == meta_b.get("device"):
            print("WARNING: both dumps were produced on the SAME device — "
                  "a cross-backend diff needs one dump per backend "
                  "(dump with --backend cpu for the host side)")
    if ours.get("input") is not None and ref.get("input") is not None:
        if not np.array_equal(np.asarray(ours["input"]),
                              np.asarray(ref["input"])):
            print("WARNING: the two dumps were made on DIFFERENT input "
                  "pixels — stage diffs are not meaningful")
    order = args.order.split(",") if args.order else None
    rows, ok = diff_dumps(
        ours.get("activations", ours), ref.get("activations", ref),
        rtol=args.rtol, atol=args.atol, order=order,
    )
    first_bad = None
    for r in rows:
        if r["status"] == "OK":
            print(f"  OK        {r['stage']:40s} max_abs={r['max_abs']:.3e} "
                  f"abs/std={r['abs_over_std']:.3e} "
                  f"max_rel={r['max_rel']:.3e} {r['shape']}")
        elif r["status"] == "DIVERGED":
            first_bad = first_bad or r["stage"]
            print(f"  DIVERGED  {r['stage']:40s} max_abs={r['max_abs']:.3e} "
                  f"abs/std={r['abs_over_std']:.3e} "
                  f"max_rel={r['max_rel']:.3e} {r['shape']}")
        else:
            print(f"  {r['status']:9s} {r['stage']}")
    n_cmp = sum(r["status"] in ("OK", "DIVERGED") for r in rows)
    print(f"{'PARITY OK' if ok else 'PARITY FAILED'}: "
          f"{n_cmp} stages compared"
          + (f"; first divergent stage: {first_bad}" if first_bad else ""))
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser("basedet_tpu activation parity harness")
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("-f", "--config", default=None)
    d.add_argument("-w", "--weights", default=None)
    d.add_argument("--image", default=None, help=".npy (H,W,3) raw pixels")
    d.add_argument("--size", type=int, default=512)
    d.add_argument("-o", "--out", required=True)
    d.add_argument("--backend", default=None,
                   help="force a jax backend for this dump (e.g. cpu); "
                        "needed because the env pins JAX_PLATFORMS")
    d.add_argument("--precision", default=None,
                   choices=("default", "float32", "highest", "high",
                            "bfloat16_3x", "tensorfloat32", "bfloat16"),
                   help="jax.default_matmul_precision for the forward; "
                        "'highest' for cross-backend drift bounding")
    d.add_argument("opts", nargs="*", default=[])
    c = sub.add_parser("diff")
    c.add_argument("ours")
    c.add_argument("ref")
    c.add_argument("--rtol", type=float, default=1e-4)
    c.add_argument("--atol", type=float, default=1e-4)
    c.add_argument("--order", default=None,
                   help="comma list fixing report order, e.g. stem,res2,...")
    args = p.parse_args(argv)
    if args.cmd == "dump":
        return _cmd_dump(args)
    return _cmd_diff(args)


if __name__ == "__main__":
    raise SystemExit(main())
