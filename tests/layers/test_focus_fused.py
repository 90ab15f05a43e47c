"""Fused Focus stem (single 2k x 2k stride-2 conv) must equal the literal
space-to-depth + kxk conv formulation with shared weights, and keep the
reference's param tree."""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from basedet_tpu.layers.blocks.yolo_block import Focus, _ConvBNAct


def test_focus_param_tree_and_equivalence():
    f = Focus(out_channels=32, train=False)
    v = f.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    names = sorted(
        "/".join(str(k) for k in p)
        for p, _ in jtu.tree_flatten_with_path(v)[0]
    )
    assert names == sorted([
        "['batch_stats']/['conv']/['BatchNorm_0']/['mean']",
        "['batch_stats']/['conv']/['BatchNorm_0']/['var']",
        "['params']/['conv']/['BatchNorm_0']/['bias']",
        "['params']/['conv']/['BatchNorm_0']/['scale']",
        "['params']/['conv']/['conv']/['kernel']",
    ])
    assert v["params"]["conv"]["conv"]["kernel"].shape == (3, 3, 12, 32)

    def space_to_depth_apply(v, x):
        tl = x[:, 0::2, 0::2, :]
        bl = x[:, 1::2, 0::2, :]
        tr = x[:, 0::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        y = jnp.concatenate([tl, bl, tr, br], axis=-1)
        m = _ConvBNAct(32, 3, 1, act="silu", train=False)
        return m.apply(
            {"params": v["params"]["conv"],
             "batch_stats": v["batch_stats"]["conv"]},
            y,
        )

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(f.apply(v, x)), np.asarray(space_to_depth_apply(v, x)),
        atol=1e-5,
    )
