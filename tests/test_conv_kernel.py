"""Fused-bottleneck Pallas kernel vs the stock XLA conv chain.

The kernel (`ops/conv_kernel.py`) is numerically exact against XLA in
bf16 on the real chip (max_err 0.0 at stage1 dims, see
benchmarks/conv_fused_bench.py); these CPU tests run it in interpret
mode at both real and toy dims so the math stays enforced without TPU
access.  Perf verdict (BASELINE.md): XLA's conv lowering WINS on
device — the kernel is kept as the measured negative result plus a
template for future conv fusion work.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionax.models import encoder as enc
from captionax.ops.conv_kernel import (default_block_images, fused_stage,
                                       pack_stage)


def xla_chain(blocks, x, dtype):
    for block in blocks:
        identity = x
        y = jax.nn.relu(enc._conv(x, block["conv1"], 1, dtype))
        y = jax.nn.relu(enc._conv(y, block["conv2"], 1, dtype))
        y = enc._conv(y, block["conv3"], 1, dtype)
        if "downsample" in block:
            identity = enc._conv(x, block["downsample"], 1, dtype)
        x = jax.nn.relu(y + identity)
    return x


@pytest.fixture(scope="module")
def resnet50():
    return enc.resnet_init(jax.random.PRNGKey(0), 50)


class TestFusedStage:
    def test_stage1_with_projection_f32_exact(self, resnet50):
        blocks = resnet50["stages"][0]
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 56, 56, 64))
        ref = xla_chain(blocks, x, jnp.float32)
        got = fused_stage(x, pack_stage(blocks), block_images=2,
                          interpret=True, f32=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4, rtol=1e-4)

    def test_identity_chain_bf16(self, resnet50):
        blocks = resnet50["stages"][1][1:3]
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 512))
        ref = np.asarray(xla_chain(blocks, x, jnp.bfloat16), np.float32)
        got = np.asarray(
            fused_stage(x, pack_stage(blocks), block_images=1,
                        interpret=True), np.float32)
        scale = np.abs(ref).max()
        assert np.abs(ref - got).max() < 0.05 * scale

    @pytest.mark.parametrize("mode", ["bigk", "taps"])
    def test_conv2_modes_agree(self, resnet50, mode):
        blocks = resnet50["stages"][0][:2]
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 56, 56, 64))
        ref = xla_chain(blocks, x, jnp.float32)
        got = fused_stage(x, pack_stage(blocks), block_images=1,
                          interpret=True, f32=True, conv2_mode=mode)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4, rtol=1e-4)

    def test_single_block_no_projection(self, resnet50):
        blocks = resnet50["stages"][2][1:2]
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 14, 14, 1024))
        ref = xla_chain(blocks, x, jnp.float32)
        got = fused_stage(x, pack_stage(blocks), block_images=1,
                          interpret=True, f32=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4, rtol=1e-4)

    def test_default_block_images_vmem_bound(self):
        # stage1 dims must stay at 1-2 images per step; tiny dims allow 8
        assert default_block_images(56, 256, 64) in (1, 2)
        assert default_block_images(8, 32, 16) == 8


class TestDeviceTime:
    def test_device_time_positive_and_floorless(self):
        from captionax.core.runtime import device_time

        x = jnp.ones((64, 128))
        w = jnp.ones((128, 128)) * 0.01
        dt = device_time(lambda v, ww: jnp.tanh(v @ ww), x, w, k=3,
                         iters=2)
        assert 0.0 <= dt < 0.5
