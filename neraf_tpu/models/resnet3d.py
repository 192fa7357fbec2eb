"""3D ResNet scene-grid encoder (flax, NDHWC).

Rebuild of the reference's ResNet3D (NeRAF_resnet3d.py:116-286, adapted from
pyramid-detection-3D): conv5^3/s2 -> BN/ReLU -> maxpool3/s2 -> bottleneck
layers [3,4,6(,3)] -> AvgPool(8) -> a single (n_features,) scene descriptor
for the 7x128^3 grid.

TPU notes:
- layout is NDHWC (channels-last) so conv3d lowers onto the MXU;
- the reference runs train-mode BatchNorm3d on batch 1 (effectively instance
  norm over D,H,W) while still tracking running stats used in eval — a
  faithful quirk we reproduce via flax BatchNorm with a batch_stats
  collection (SURVEY.md §7 "Batch-1 BatchNorm3d semantics");
- Xavier-normal conv init matches the reference (:160-165).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from neraf_tpu.ops.conv3d import conv3d_mm_wgrad

_XAVIER = nn.initializers.xavier_normal()


class _TapConv(nn.Module):
    """Drop-in nn.Conv(use_bias=False) replacement whose weight gradient is
    computed as k^3 tap matmuls (ops/conv3d.py) — the batch-1 wgrad path XLA
    lowers poorly for 3D convs. Identical forward, identical param layout
    ({kernel: (k,k,k,Cin,Cout)}), so checkpoints are interchangeable."""

    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", _XAVIER,
                       (self.kernel,) * 3 + (x.shape[-1], self.features))
        return conv3d_mm_wgrad(x.astype(self.dtype), w.astype(self.dtype),
                               self.stride, (self.kernel - 1) // 2)


class _StemConv(nn.Module):
    """The stem conv (k=5, stride 2, pad 2, C_in -> features) with a
    space-to-depth formulation that is numerically identical to the direct
    convolution but maps onto the MXU ~8x better.

    Why: at batch 1 with C_in=7 the direct k5/s2 conv's weight-gradient is
    the hottest op of the whole joint step (17.9 ms of a 73 ms step,
    profiled on v5e — the 7-wide contraction wastes >94% of each MXU pass
    and XLA chunks the 125-position wgrad through halo'd slices). Folding
    each 2^3 input block into channels turns it into a k3/stride-1 conv
    with 8*C_in input channels on the half-res volume: identical output
    (kernel index i factors as i = 2*kd + r, the padded i=5 tap is zero),
    same FLOPs, dense MXU shapes for forward, dx and dW alike.

    The parameter keeps the direct layout (5,5,5,C_in,features) under the
    same "conv1" scope, so checkpoints are interchangeable between impls.
    """

    features: int = 64
    impl: str = "s2d"  # "s2d" | "direct"
    conv_impl: str = "direct"  # weight-gradient path: "direct" | "mm_wgrad"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, reshard=None, prefolded: bool = False,
                 bake_slab=None):
        if reshard is None:
            reshard = lambda t, next_stride=1: t
        conv = (conv3d_mm_wgrad if self.conv_impl == "mm_wgrad"
                else lambda xx, ww, s, p: jax.lax.conv_general_dilated(
                    xx, ww, window_strides=(s,) * 3, padding=((p, p),) * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
        n, d, h, w_sp, c = x.shape
        if prefolded:
            # x is ALREADY the s2d-folded (N, D/2, H/2, W/2, 8*C_in) volume
            # (models/grid.py fold order) in the compute dtype — the joint
            # step keeps the grid state pre-folded so the full-volume
            # relayout below never runs per-step.
            c = c // 8
            w = self.param("kernel", _XAVIER, (5, 5, 5, c, self.features))
            wp = jnp.pad(w.astype(self.dtype),
                         ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
            wp = wp.reshape(3, 2, 3, 2, 3, 2, c, self.features)
            wp = wp.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(
                3, 3, 3, 8 * c, self.features)
            xs = reshard(x.astype(self.dtype), 1)
            if bake_slab is not None:
                # live-bake path: route the input gradient straight to the
                # baked slab instead of materializing the full-volume dgrad,
                # and run the weight grad as the Pallas one-pass kernel when
                # allowed (ops/baked_stem.py)
                from neraf_tpu.ops.baked_stem import stem_conv_baked

                slab, d0, h0, ch_off, allow_pallas = bake_slab
                return stem_conv_baked(xs, slab.astype(self.dtype),
                                       d0, h0, ch_off, wp, allow_pallas)
            return conv(xs, wp, 1, 1)
        w = self.param("kernel", _XAVIER, (5, 5, 5, c, self.features))
        wc = w.astype(self.dtype)
        # cast FIRST: the s2d reshape below is a physical relayout of the
        # full volume, and doing it in fp32 doubles its HBM traffic
        # (profiled 2.0 ms as an f32 copy on v5e)
        xc = x.astype(self.dtype)
        if self.dtype != x.dtype:
            # force the cast to materialize BEFORE the s2d relayout —
            # without the barrier XLA sinks the cast past the transpose and
            # relays the full volume at fp32 width (profiled 2.0 ms f32
            # copy on v5e vs ~1 ms at bf16)
            xc = jax.lax.optimization_barrier(xc)
        if self.impl != "s2d" or any(s % 2 for s in (d, h, w_sp)):
            xc = reshard(xc, 2)
            return conv(xc, wc, 2, 2)
        # kernel: pad taps 5 -> 6, factor i = 2*kd + r -> (3, 2) per axis,
        # gather the within-block taps (r_d, r_h, r_w) into channels
        wp = jnp.pad(wc, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
        wp = wp.reshape(3, 2, 3, 2, 3, 2, c, self.features)
        wp = wp.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(
            3, 3, 3, 8 * c, self.features)
        # depth-shard BEFORE the fold so the full-volume relayout below runs
        # on 1/n of the planes per chip instead of replicated on every one
        # (the fold halves depth like a stride-2 op, hence next_stride=2:
        # post-fold shards keep >= 2 planes exactly when the hook's
        # d >= 2*2*n_shards guard holds on the pre-fold volume)
        xc = reshard(xc, 2)
        # input: fold each 2^3 spatial block into channels (same
        # (r_d, r_h, r_w, c) order as the kernel)
        xs = xc.reshape(n, d // 2, 2, h // 2, 2, w_sp // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            n, d // 2, h // 2, w_sp // 2, 8 * c)
        xs = reshard(xs, 1)  # the windowed op below is now stride 1
        return conv(xs, wp, 1, 1)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32
    conv_impl: str = "direct"  # "direct" (XLA) | "mm_wgrad" (tap-matmul dW; slower blanket-applied: A/B 53.2 vs 49.7 ms/step on v5e r5)

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name, dtype=self.dtype)
        if self.conv_impl == "mm_wgrad":
            conv = lambda ch, k, name, stride=1: _TapConv(
                ch, k[0], stride, dtype=self.dtype, name=name)
        else:
            conv = lambda ch, k, name, stride=1: nn.Conv(
                ch, k, strides=(stride,) * 3, padding=(k[0] - 1) // 2,
                use_bias=False, kernel_init=_XAVIER, name=name,
                dtype=self.dtype)
        residual = x
        out = conv(self.planes, (1, 1, 1), "conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.planes, (3, 3, 3), "conv2", self.stride)(out)
        out = nn.relu(bn("bn2")(out))
        out = conv(self.planes * self.expansion, (1, 1, 1), "conv3")(out)
        out = bn("bn3")(out)

        if self.downsample:
            residual = conv(self.planes * self.expansion, (1, 1, 1), "down_conv",
                            self.stride)(x)
            residual = bn("down_bn")(residual)
        return nn.relu(out + residual)


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1
    dtype: Any = jnp.float32
    conv_impl: str = "direct"  # "direct" (XLA) | "mm_wgrad" (tap-matmul dW; slower blanket-applied: A/B 53.2 vs 49.7 ms/step on v5e r5)

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name, dtype=self.dtype)
        if self.conv_impl == "mm_wgrad":
            conv = lambda ch, k, name, stride=1: _TapConv(
                ch, k, stride, dtype=self.dtype, name=name)
        else:
            conv = lambda ch, k, name, stride=1: nn.Conv(
                ch, (k,) * 3, strides=(stride,) * 3, padding=(k - 1) // 2,
                use_bias=False, kernel_init=_XAVIER, name=name,
                dtype=self.dtype)
        residual = x
        out = conv(self.planes, 3, "conv1", self.stride)(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.planes, 3, "conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            residual = conv(self.planes * self.expansion, 1, "down_conv",
                            self.stride)(x)
            residual = bn("down_bn")(residual)
        return nn.relu(out + residual)


_BACKBONES = {
    "resnet18": (BasicBlock3D, (2, 2, 2, 2)),
    "resnet34": (BasicBlock3D, (3, 4, 6, 3)),
    "resnet50": (Bottleneck3D, (3, 4, 6, 3)),
    "resnet101": (Bottleneck3D, (3, 4, 23, 3)),
    "resnet152": (Bottleneck3D, (3, 8, 36, 3)),
}


class ResNet3D(nn.Module):
    """Scene-grid encoder: (N, D, H, W, C_in) -> (N, feature_dim).

    n_features in {1024, 2048} gates whether layer4 runs (reference
    NeRAF_resnet3d.py:128-131). The actual output width depends on the block
    type — the reference probes it at build time (NeRAF_model.py:186-188);
    here `feature_dim` computes it statically.
    """

    backbone: str = "resnet50"
    n_features: int = 1024
    grid_step: float = 1.0 / 128.0
    dtype: Any = jnp.float32  # compute dtype for convs/BN (bf16 under AMP)
    stem_impl: str = "s2d"  # "s2d" (MXU-friendly, see _StemConv) | "direct"
    pool_impl: str = "separable"  # "separable" (cheap 1-D backwards) | "direct"
    conv_impl: str = "direct"  # "direct" (XLA) | "mm_wgrad" (tap-matmul dW; slower blanket-applied: A/B 53.2 vs 49.7 ms/step on v5e r5)

    @property
    def feature_dim(self) -> int:
        block, _ = _BACKBONES[self.backbone]
        planes = 512 if self.n_features == 2048 else 256
        return planes * block.expansion

    @nn.compact
    def __call__(self, x, train: bool = True, reshard=None,
                 prefolded: bool = False, bake_slab=None):
        """reshard: optional callable(x, next_stride) -> x applied at the
        input and at every stage boundary. Under a device mesh the pipeline
        passes a hook that depth-shards the volume while every windowed op
        in the next stage keeps a per-shard slab of >= 2 planes, and
        EXPLICITLY re-replicates once it would fall below — letting the
        split propagate into windowed ops with 1-plane shards silently
        corrupts the conv results (measured on the XLA CPU partitioner:
        stride-2 conv3d at 1 plane/shard returns wrong values without
        erroring; pinned by tests/test_parallel.py numerics assert)."""
        assert self.n_features in (1024, 2048), "N_features should be 1024 or 2048"
        block, layers = _BACKBONES[self.backbone]
        if reshard is None:
            reshard = lambda t, next_stride=1: t

        x = _StemConv(features=64, impl=self.stem_impl,
                      conv_impl=self.conv_impl, dtype=self.dtype,
                      name="conv1")(x, reshard=reshard, prefolded=prefolded,
                                    bake_slab=bake_slab)  # k5/s2: 128 -> 64
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn1", dtype=self.dtype)(x))
        x = reshard(x, 2)  # maxpool is stride 2
        if self.pool_impl == "separable":
            # max over a 3^3 window factorizes into three 1-D maxpools
            # (identical forward values incl. the -inf padding). The joint
            # window's select-and-scatter backward cost 4.3 ms/step on v5e;
            # the three 1-D backwards are far cheaper and the volume shrinks
            # 2x after each axis. Gradient routing differs from the joint
            # form only on exact ties inside a window (both route the full
            # gradient to one tied — hence equal-valued — element, so both
            # are valid subgradients; torch picks the first flat index).
            x = nn.max_pool(x, (3, 1, 1), strides=(2, 1, 1),
                            padding=((1, 1), (0, 0), (0, 0)))
            x = nn.max_pool(x, (1, 3, 1), strides=(1, 2, 1),
                            padding=((0, 0), (1, 1), (0, 0)))
            x = nn.max_pool(x, (1, 1, 3), strides=(1, 1, 2),
                            padding=((0, 0), (0, 0), (1, 1)))  # -> 32
        else:
            x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                            padding=((1, 1),) * 3)  # -> 32

        def stage(x, planes, blocks, stride, name):
            in_ch = x.shape[-1]
            needs_down = stride != 1 or in_ch != planes * block.expansion
            x = reshard(x, stride)
            x = block(planes=planes, stride=stride, downsample=needs_down,
                      name=f"{name}_0", dtype=self.dtype,
                      conv_impl=self.conv_impl)(x, train)
            for i in range(1, blocks):
                x = block(planes=planes, name=f"{name}_{i}", dtype=self.dtype,
                          conv_impl=self.conv_impl)(x, train)
            return x

        x = stage(x, 64, layers[0], 1, "layer1")   # 32
        x = stage(x, 128, layers[1], 2, "layer2")  # 16
        x = stage(x, 256, layers[2], 2, "layer3")  # 8
        if self.n_features == 2048:
            x = stage(x, 512, layers[3], 2, "layer4")  # 4

        # AvgPool(k, stride 1) with k chosen so the output is 1^3
        # (reference :135-155); valid padding over the full remaining volume.
        pool = x.shape[1]
        x = nn.avg_pool(x, (pool, pool, pool), strides=(1, 1, 1))
        return x.reshape(x.shape[0], -1).astype(jnp.float32)
