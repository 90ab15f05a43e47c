"""PointHead share_param modes (reference point_head.py:31-151 SHARE_PARAM cfg)."""
import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.layers.head.point_head import PointHead


def _feats(levels=5, c=32):
    return [jnp.ones((1, 2 ** (6 - i), 2 ** (6 - i), c)) for i in range(levels)]


def _param_count(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def test_share_param_false_has_per_level_subnets():
    feats = _feats()
    shared = PointHead(num_classes=8, num_convs=2, share_param=True)
    per_level = PointHead(num_classes=8, num_convs=2, share_param=False)
    p_shared = shared.init(jax.random.PRNGKey(0), feats)
    p_level = per_level.init(jax.random.PRNGKey(0), feats)
    n_shared, n_level = _param_count(p_shared), _param_count(p_level)
    # per-level replicates everything except the scales vector (len 5)
    assert n_level == 5 * (n_shared - 5) + 5

    for head, params in ((shared, p_shared), (per_level, p_level)):
        logits, offsets, ctrness = head.apply(params, feats)
        assert len(logits) == len(offsets) == len(ctrness) == 5
        assert logits[0].shape == (1, 64, 64, 8)
        assert offsets[0].shape == (1, 64, 64, 4)
        assert all(np.all(np.asarray(o) >= 0) for o in offsets)


def test_fcos_builds_with_unshared_head():
    from basedet_tpu import configs as C

    cfg = C.FCOSConfig()
    cfg.MODEL.BACKBONE.NAME = "resnet18"
    cfg.MODEL.HEAD.SHARE_PARAM = False
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(64, 64))
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("cls_subnet_l4" in n for n in names)
