"""ResNet encoder parity vs a torch-built bottleneck ResNet.

torchvision is not installed in this image, so the oracle is a minimal
torch ResNet-50 assembled here with torchvision's exact structure and
state_dict naming; from_torch_state_dict must reproduce its eval-mode
forward (BN folded)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from captionax.models.encoder import (
    adaptive_avg_pool,
    encoder_cnn,
    encoder_cnn_int8,
    from_torch_state_dict,
    resnet_apply,
    resnet_apply_int8,
    resnet_init,
    resnet_quantize,
)


class Bottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1, downsample=None):
        super().__init__()
        cout = width * 4
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(cout)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet(torch.nn.Module):
    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        cin = 64
        for s, (n, width) in enumerate(zip(blocks, (64, 128, 256, 512))):
            layers = []
            stride = 1 if s == 0 else 2
            down = torch.nn.Sequential(
                torch.nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                torch.nn.BatchNorm2d(width * 4),
            )
            layers.append(Bottleneck(cin, width, stride, down))
            cin = width * 4
            for _ in range(n - 1):
                layers.append(Bottleneck(cin, width))
            setattr(self, f"layer{s + 1}", torch.nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


@pytest.fixture(scope="module")
def torch_resnet():
    torch.manual_seed(0)
    m = TorchResNet().eval()
    # randomize BN stats so folding is actually exercised
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.1)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.normal_(0, 0.1)
    return m


class TestResNetParity:
    def test_forward_matches_torch(self, torch_resnet):
        x = torch.randn(1, 3, 224, 224)
        with torch.no_grad():
            ref = torch_resnet(x).permute(0, 2, 3, 1).numpy()
        params = from_torch_state_dict(torch_resnet.state_dict(), depth=50)
        out = np.asarray(
            resnet_apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                         compute_dtype=jnp.float32)
        )
        assert out.shape == ref.shape == (1, 7, 7, 2048)
        np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)

    def test_encoder_cnn_token_layout(self, torch_resnet):
        params = from_torch_state_dict(torch_resnet.state_dict(), depth=50)
        x = jnp.zeros((2, 224, 224, 3))
        toks = encoder_cnn(params, x, compute_dtype=jnp.float32)
        assert toks.shape == (2, 49, 2048)

    def test_bfloat16_close_to_f32(self, torch_resnet):
        params = from_torch_state_dict(torch_resnet.state_dict(), depth=50)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 224, 224, 3), jnp.float32)
        f32 = np.asarray(resnet_apply(params, x, compute_dtype=jnp.float32))
        bf16 = np.asarray(resnet_apply(params, x, compute_dtype=jnp.bfloat16))
        # relative agreement on the feature map scale
        denom = np.abs(f32).mean() + 1e-6
        assert np.abs(bf16 - f32).mean() / denom < 0.1


class TestInt8Encoder:
    # int8 conv compiles slowly on the CPU backend, so everything shares
    # one quantization + one forward at 64x64
    @pytest.fixture(scope="class")
    def int8_run(self, torch_resnet):
        from captionax.models.encoder import resnet_calibrate

        params = from_torch_state_dict(torch_resnet.state_dict(), depth=50)
        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32
        )
        # calibrated static activation scales: the serving config
        scales = resnet_calibrate(params, x, compute_dtype=jnp.float32)
        qparams = resnet_quantize(params, act_scales=scales)
        f32 = np.asarray(resnet_apply(params, x, compute_dtype=jnp.float32))
        q = np.asarray(
            resnet_apply_int8(qparams, x, compute_dtype=jnp.float32)
        )
        return qparams, f32, q

    def test_features_close_to_f32(self, int8_run):
        _, f32, q = int8_run
        assert q.shape == f32.shape == (1, 2, 2, 2048)
        denom = np.abs(f32).mean() + 1e-6
        assert np.abs(q - f32).mean() / denom < 0.1
        cos = float(
            (q.ravel() @ f32.ravel())
            / (np.linalg.norm(q) * np.linalg.norm(f32) + 1e-12)
        )
        assert cos > 0.99

    def test_dynamic_scales_close_to_f32(self, torch_resnet, int8_run):
        """Without calibration the apply path falls back to dynamic
        per-tensor scales — numerically fine, just slower on TPU."""
        params = from_torch_state_dict(torch_resnet.state_dict(), depth=50)
        _, f32, _ = int8_run
        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32
        )
        q = np.asarray(
            resnet_apply_int8(
                resnet_quantize(params), x, compute_dtype=jnp.float32
            )
        )
        denom = np.abs(f32).mean() + 1e-6
        assert np.abs(q - f32).mean() / denom < 0.1

    def test_quantized_kernels_are_int8(self, int8_run):
        qparams, _, _ = int8_run
        block = qparams["stages"][0][0]
        assert block["conv2"]["q"].dtype == jnp.int8
        assert block["conv2"]["wscale"].shape == (64,)
        # stem stays unquantized (bf16 path)
        assert "kernel" in qparams["stem"]

    def test_token_layout(self, int8_run):
        import jax

        qparams, _, _ = int8_run
        # eval_shape: trace-only (a second int8 compile costs ~1 min on CPU)
        toks = jax.eval_shape(
            encoder_cnn_int8, qparams, jnp.zeros((2, 64, 64, 3))
        )
        assert toks.shape == (2, 4, 2048)


class TestAdaptivePool:
    def test_downsample_matches_torch(self):
        x = torch.randn(1, 8, 7, 7)
        ref = torch.nn.AdaptiveAvgPool2d((3, 3))(x).permute(0, 2, 3, 1).numpy()
        out = np.asarray(
            adaptive_avg_pool(jnp.asarray(x.permute(0, 2, 3, 1).numpy()), (3, 3))
        )
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_upsample_matches_torch(self):
        # the reference pools 7x7 UP to 14x14 (encoder.py:44)
        x = torch.randn(1, 4, 7, 7)
        ref = torch.nn.AdaptiveAvgPool2d((14, 14))(x).permute(0, 2, 3, 1).numpy()
        out = np.asarray(
            adaptive_avg_pool(jnp.asarray(x.permute(0, 2, 3, 1).numpy()), (14, 14))
        )
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestRandomInit:
    def test_shapes_and_finiteness(self):
        import jax

        params = resnet_init(jax.random.PRNGKey(0), depth=50)
        x = jnp.ones((1, 64, 64, 3))
        out = resnet_apply(params, x, compute_dtype=jnp.float32)
        assert out.shape == (1, 2, 2, 2048)
        assert bool(jnp.isfinite(out).all())
