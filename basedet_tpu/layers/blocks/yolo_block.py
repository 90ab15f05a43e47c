"""YOLO building blocks (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/blocks/yolo_block.py:11-133
(DepthwiseConvBlock, SPPBottleneck, Bottleneck, CSPLayer) and
basic_block.py:14 (Focus). All use BN with YOLOX hyperparams threaded via
``bn_eps``/``bn_momentum``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.common.blocks import get_activation, get_norm
from basedet_tpu.layers.precision import Conv


class _ConvBNAct(nn.Module):
    out_channels: int
    ksize: int = 1
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    train: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97

    @nn.compact
    def __call__(self, x):
        pad = (self.ksize - 1) // 2
        x = Conv(
            self.out_channels, (self.ksize, self.ksize),
            (self.stride, self.stride), padding=pad,
            feature_group_count=self.groups, use_bias=False, name="conv",
        )(x)
        # remat anchor: under TRAINER.REMAT="selective" only conv outputs
        # are saved for backward; BN/SiLU activations (≈2/3 of activation
        # memory) are recomputed (engine/train_state.py policy)
        x = jax.ad_checkpoint.checkpoint_name(x, "conv_out")
        x = get_norm(
            "BN", self.train, eps=self.bn_eps, momentum=self.bn_momentum
        )()(x)
        return get_activation(self.act)(x)


class DepthwiseConvBlock(nn.Module):
    out_channels: int
    ksize: int = 3
    stride: int = 1
    act: str = "silu"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        x = _ConvBNAct(c_in, self.ksize, self.stride, groups=c_in,
                       act=self.act, train=self.train, name="dconv")(x)
        return _ConvBNAct(self.out_channels, 1, 1, act=self.act,
                          train=self.train, name="pconv")(x)


def make_conv(depthwise: bool):
    return DepthwiseConvBlock if depthwise else _ConvBNAct


class _RearrangedStemConv(nn.Module):
    """The Focus conv: reshape-transpose space-to-depth + kxk/s1 dense conv.

    History: round 1 measured a slice-4x+concat space-to-depth LOSING to a
    fused 2k x 2k/s2 pixel conv (5.0 vs 9.9 ms fwd b128 640px) and shipped
    the fused form. Round 3 re-measured with a reshape-transpose pack
    (playground/probe_stems.py): the packed form wins decisively — f+b
    9.38 (fused6) vs 6.47 (s2d) vs 5.26 ms (pre-packed) at b128 — because
    the dense stride-1 3x3 conv over 12 channels fills the MXU K-dim 4x
    better than the 6x6/s2 conv over 3 channels, and the pack transpose
    fuses with neighbouring elementwise work. The parameter keeps the
    reference's (k, k, 4C, out) layout/name (reference basic_block.py:14
    concat order tl,bl,tr,br = channel block 2*dx+dy) so checkpoints and
    weight converters are unaffected.
    """

    out_channels: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x):
        from basedet_tpu.layers.precision import compute_dtype

        B, H, W, C = x.shape
        k = self.ksize
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 4 * C, self.out_channels),
        )
        dt = compute_dtype()
        if dt is not None:
            x, kernel = x.astype(dt), kernel.astype(dt)
        # pack to (B, H/2, W/2, 4C), channel block = 2*dx + dy (focus order)
        xp = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xp = xp.transpose(0, 1, 3, 4, 2, 5)  # (B, i, j, dx, dy, C)
        xp = xp.reshape(B, H // 2, W // 2, 4 * C)
        pad = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            xp, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Focus(nn.Module):
    """Space-to-depth stem (reference basic_block.py:14): 2x2 pixel
    de-interleave → 4C channels → conv — computed as a fused stride-2 conv
    (see _RearrangedStemConv; bit-equivalent, tested)."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        class _Sub(nn.Module):
            outer: Focus

            @nn.compact
            def __call__(self, x):  # mirrors _ConvBNAct's param tree
                o = self.outer
                x = _RearrangedStemConv(o.out_channels, o.ksize, name="conv")(x)
                x = get_norm("BN", o.train, eps=1e-3, momentum=0.97)()(x)
                return get_activation(o.act)(x)

        return _Sub(self, name="conv")(x)


class SPPBottleneck(nn.Module):
    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = _ConvBNAct(hidden, 1, 1, act=self.act, train=self.train,
                       name="conv1")(x)
        pools = [x]
        for ks in self.kernel_sizes:
            pools.append(
                nn.max_pool(
                    x, (ks, ks), strides=(1, 1),
                    padding=((ks // 2, ks // 2), (ks // 2, ks // 2)),
                )
            )
        x = jnp.concatenate(pools, axis=-1)
        return _ConvBNAct(self.out_channels, 1, 1, act=self.act,
                          train=self.train, name="conv2")(x)


class Bottleneck(nn.Module):
    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * self.expansion)
        y = _ConvBNAct(hidden, 1, 1, act=self.act, train=self.train,
                       name="conv1")(x)
        Conv = make_conv(self.depthwise)
        y = Conv(self.out_channels, 3, 1, act=self.act, train=self.train,
                 name="conv2")(y)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


def fused_bn_enabled() -> bool:
    """Fused-BN CSP path gate (round 4): Pallas fused GEMM+stats chain for
    train-mode CSP layers (ops/fused_bn.py). Requires a TPU backend and the
    bf16 compute policy. Opt-in via BASEDET_FUSED_BN=1 pending the in-train
    A/B (flip-or-delete discipline, docs/ROADMAP.md)."""
    import os

    if os.environ.get("BASEDET_FUSED_BN", "0") != "1":
        return False
    from basedet_tpu.layers.precision import compute_dtype

    if compute_dtype() != jnp.bfloat16:
        return False
    if os.environ.get("BASEDET_FUSED_BN_INTERPRET", "0") == "1":
        return True  # CPU tests: interpret-mode kernels
    import jax as _jax

    try:
        return _jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _fused_bn_interpret() -> bool:
    import os

    return os.environ.get("BASEDET_FUSED_BN_INTERPRET", "0") == "1"


class _ConvKernelParam(nn.Module):
    """Declares the same param ('kernel') precision.Conv would, without
    running the conv — the fused CSP path reads it directly."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )


class _BNParams(nn.Module):
    """Declares nn.BatchNorm's params/variables by name (scale/bias +
    batch_stats mean/var) for the fused path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean, var


class _FusedConvBN(nn.Module):
    """Param-tree mirror of one _ConvBNAct (conv/kernel + BatchNorm_0/*)."""

    cin: int
    cout: int
    k: int = 1

    @nn.compact
    def __call__(self):
        kernel = _ConvKernelParam(
            (self.k, self.k, self.cin, self.cout), name="conv"
        )()
        scale, bias, mean, var = _BNParams(self.cout, name="BatchNorm_0")()
        return kernel, scale, bias, mean, var


class _FusedBottleneck(nn.Module):
    """Param-tree mirror of one Bottleneck (conv1 1x1 + conv2 3x3)."""

    hidden: int

    @nn.compact
    def __call__(self):
        a = _FusedConvBN(self.hidden, self.hidden, 1, name="conv1")()
        b = _FusedConvBN(self.hidden, self.hidden, 3, name="conv2")()
        return a, b


class CSPLayer(nn.Module):
    """C3: CSP bottleneck with 3 convs (yolo_block.py:91-133)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * self.expansion)
        if (
            self.train
            and not self.depthwise
            and self.act == "silu"
            and fused_bn_enabled()
        ):
            return self._fused(x, hidden)
        x1 = _ConvBNAct(hidden, 1, 1, act=self.act, train=self.train,
                        name="conv1")(x)
        x2 = _ConvBNAct(hidden, 1, 1, act=self.act, train=self.train,
                        name="conv2")(x)
        for i in range(self.n):
            x1 = Bottleneck(
                hidden, self.shortcut, 1.0, self.depthwise, self.act,
                self.train, name=f"m_{i}",
            )(x1)
        x = jnp.concatenate([x1, x2], axis=-1)
        return _ConvBNAct(self.out_channels, 1, 1, act=self.act,
                          train=self.train, name="conv3")(x)

    def _fused(self, x, hidden):
        """Pallas fused-BN chain (ops/fused_bn.py). Same param tree as the
        standard branch (holder modules above), same BN hyperparams
        (eps 1e-3 / momentum 0.97 — _ConvBNAct defaults)."""
        from basedet_tpu.layers.blocks.csp_fused import csp_layer_fused

        cin = x.shape[-1]
        holders = {
            "conv1": _FusedConvBN(cin, hidden, 1, name="conv1")(),
            "conv2": _FusedConvBN(cin, hidden, 1, name="conv2")(),
            "conv3": _FusedConvBN(
                2 * hidden, self.out_channels, 1, name="conv3"
            )(),
        }
        bottlenecks = [
            _FusedBottleneck(hidden, name=f"m_{i}")() for i in range(self.n)
        ]

        params = {}
        stat_vars = {}

        def unpack(key, parts):
            kernel, scale, bias, mean, var = parts
            params[key + "/w"] = kernel
            params[key + "/g"] = scale
            params[key + "/b"] = bias
            stat_vars[key] = (mean, var)

        unpack("conv1", holders["conv1"])
        unpack("conv2", holders["conv2"])
        unpack("conv3", holders["conv3"])
        for i, (a, b) in enumerate(bottlenecks):
            unpack(f"m{i}a", a)
            unpack(f"m{i}b", b)

        out, moments = csp_layer_fused(
            params, x.astype(jnp.bfloat16), self.n,
            shortcut=self.shortcut, eps=1e-3,
            interpret=_fused_bn_interpret(),
        )
        if not self.is_initializing():
            mom = 0.97  # _ConvBNAct default, reference yolox.py:35-36
            for key, (mean_v, var_v) in stat_vars.items():
                bm, bv = moments[key]
                mean_v.value = mom * mean_v.value + (1 - mom) * bm
                var_v.value = mom * var_v.value + (1 - mom) * bv
        return out
