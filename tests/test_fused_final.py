"""Fused dropout+final-conv kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.ops.pallas.fused_final import dropout_final_conv


def ref_conv(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel.astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


@pytest.mark.parametrize("shape", [(2, 8, 16, 128), (1, 6, 10, 256)])
@pytest.mark.parametrize("cout", [36, 72])
def test_rate_zero_matches_exact_conv(shape, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    kernel = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, shape[-1], cout)) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2), (cout,))
    out = dropout_final_conv(
        x, kernel, bias, jnp.int32(7), num_samples=3, keep_prob=1.0,
        interpret=True,
    )
    assert out.shape == (3, *shape[:-1], cout)
    expect = ref_conv(x, kernel, bias)
    for n in range(3):
        np.testing.assert_allclose(
            np.asarray(out[n], np.float32), np.asarray(expect), atol=0.15, rtol=0.05
        )  # bf16 inputs vs fp32 reference


@pytest.mark.parametrize("input_mode", ["resident", "dma"])
def test_sharded_launch_slices_match_unsharded(input_mode):
    """sample_base/batch_base/total_samples (the shard_map serving seam):
    a launch computing samples [b, b+k) of N — or an image sub-range —
    must return EXACTLY the corresponding slice of the unsharded launch
    (absolute-index mask stream)."""
    key = jax.random.PRNGKey(21)
    x = jax.random.normal(key, (4, 12, 16, 128), jnp.float32)
    kernel = (
        jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 128, 36)) * 0.05
    )
    bias = jax.random.normal(jax.random.fold_in(key, 2), (36,))
    kw = dict(keep_prob=0.6, interpret=True, input_mode=input_mode)
    full = dropout_final_conv(
        x, kernel, bias, jnp.int32(9), num_samples=4, **kw
    )
    # Sample shards: two launches of 2 samples each at bases 0 / 2.
    for base in (0, 2):
        part = dropout_final_conv(
            x, kernel, bias, jnp.int32(9), num_samples=2,
            sample_base=jnp.int32(base), total_samples=4, **kw
        )
        assert bool(jnp.all(part == full[base : base + 2]))
    # Batch shards: two launches of 2 images each at bases 0 / 2.
    for bb in (0, 2):
        part = dropout_final_conv(
            x[bb : bb + 2], kernel, bias, jnp.int32(9), num_samples=4,
            batch_base=jnp.int32(bb), **kw
        )
        assert bool(jnp.all(part == full[:, bb : bb + 2]))


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
def test_dma_mode_bit_identical_to_resident(dtype):
    """input_mode="dma" (HBM-resident input, manually DMA'd slabs) must
    reproduce the resident path EXACTLY — same absolute-index mask hash."""
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (2, 20, 24, 128), jnp.float32)
    kernel = (
        jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 128, 36)) * 0.05
    )
    bias = jax.random.normal(jax.random.fold_in(key, 2), (36,))
    kw = dict(num_samples=3, keep_prob=0.7, interpret=True, dtype=dtype)
    a = dropout_final_conv(x, kernel, bias, jnp.int32(5), input_mode="resident", **kw)
    d = dropout_final_conv(x, kernel, bias, jnp.int32(5), input_mode="dma", **kw)
    assert bool(jnp.all(a == d))


def test_dma_mode_rate_zero_matches_exact_conv():
    key = jax.random.PRNGKey(12)
    x = jax.random.normal(key, (1, 18, 26, 128), jnp.float32)
    kernel = (
        jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 128, 36)) * 0.05
    )
    bias = jax.random.normal(jax.random.fold_in(key, 2), (36,))
    out = dropout_final_conv(
        x, kernel, bias, jnp.int32(7), num_samples=2, keep_prob=1.0,
        interpret=True, input_mode="dma",
    )
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32),
        np.asarray(ref_conv(x, kernel, bias)),
        atol=0.15, rtol=0.05,
    )


def test_input_mode_auto_selects_dma_for_large_levels():
    from bayesod_tpu.ops.pallas import fused_final as ff

    # BDD-P3 scale (90x160x256) exceeds the resident budget...
    assert ff.vmem_resident_bytes(90, 160, 256) > ff.VMEM_BUDGET
    # ...KITTI-P3 (48x160x256) fits.
    assert ff.vmem_resident_bytes(48, 160, 256) <= ff.VMEM_BUDGET


def test_dropout_statistics():
    """Mask rate and scaling: E[out] ~ conv(x) and zero-rate ~ dropout rate."""
    key = jax.random.PRNGKey(3)
    shape = (1, 8, 16, 128)
    x = jnp.abs(jax.random.normal(key, shape)) + 0.5  # strictly positive
    cout = 36
    # Identity-ish kernel: center tap only, first cout channels summed.
    kernel = jnp.zeros((3, 3, 128, cout)).at[1, 1, :cout, :].set(jnp.eye(cout))
    bias = jnp.zeros((cout,))
    n = 64
    out = dropout_final_conv(
        x, kernel, bias, jnp.int32(11), num_samples=n, keep_prob=0.7,
        interpret=True,
    )
    # With the center-tap identity kernel, out[n,b,h,w,c] = mask*x/keep for
    # channel c -> fraction of zeros ~ 0.3, mean over samples ~ x.
    vals = np.asarray(out, np.float32)
    zero_frac = (vals == 0).mean()
    assert 0.25 < zero_frac < 0.35, zero_frac
    mean = vals.mean(axis=0)
    expect = np.asarray(x[..., :cout], np.float32)
    np.testing.assert_allclose(mean, expect, rtol=0.25, atol=0.25)


def test_samples_differ_and_deterministic():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 4, 8, 128))
    kernel = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 128, 36)) * 0.1
    bias = jnp.zeros((36,))
    o1 = dropout_final_conv(
        x, kernel, bias, jnp.int32(1), num_samples=2, keep_prob=0.5,
        interpret=True,
    )
    o2 = dropout_final_conv(
        x, kernel, bias, jnp.int32(1), num_samples=2, keep_prob=0.5,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))  # same seed
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o1[1]))  # diff samples
    o3 = dropout_final_conv(
        x, kernel, bias, jnp.int32(2), num_samples=2, keep_prob=0.5,
        interpret=True,
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o3))  # diff seeds


class TestFusedModelPath:
    """mc_forward with head_final_backend=pallas (interpret mode on CPU)."""

    def _setup(self, backend):
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables
        from bayesod_tpu.utils.config import ModelConfig

        cfg = ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=128, norm="groupnorm",
            compute_dtype="float32", dropout_layers="last",
            head_final_backend=backend,
        )
        model = RetinaNet(cfg=cfg, train=False)
        variables = init_variables(model, jax.random.PRNGKey(0), (128, 128))
        return model, variables

    def test_shapes_and_sampling(self):
        from bayesod_tpu.models.retinanet import mc_forward

        model, variables = self._setup("pallas")
        img = jnp.ones((2, 128, 128, 3))
        logits, deltas, log_vars = mc_forward(
            model, variables, img, jax.random.PRNGKey(1), 3
        )
        assert logits.shape[0] == 3 and logits.shape[1] == 2
        assert logits.shape[-1] == 4 and deltas.shape[-1] == 4
        assert bool(jnp.all(jnp.isfinite(logits)))
        # samples differ (dropout active in the kernel)
        assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))

    def test_statistically_matches_xla_path(self):
        """Mean over many samples must agree between pallas and xla MC paths
        (identical distribution, different RNG streams)."""
        from bayesod_tpu.models.retinanet import mc_forward

        model_p, variables = self._setup("pallas")
        model_x, _ = self._setup("xla")
        img = jnp.ones((1, 128, 128, 3))
        n = 48
        lp, dp_, _ = mc_forward(model_p, variables, img, jax.random.PRNGKey(1), n)
        lx, dx_, _ = mc_forward(model_x, variables, img, jax.random.PRNGKey(2), n)
        np.testing.assert_allclose(
            np.asarray(lp.mean(0)), np.asarray(lx.mean(0)), atol=0.15
        )
        np.testing.assert_allclose(
            np.asarray(dp_.mean(0)), np.asarray(dx_.mean(0)), atol=0.15
        )


@pytest.mark.parametrize("mode", ["resident", "dma"])
def test_probs_kernel_matches_softmax_mean_oracle(mode):
    """dropout_final_probs == mean(grouped softmax(dropout_final_conv))
    with the same seed (identical mask streams)."""
    from bayesod_tpu.ops.pallas.fused_final import dropout_final_probs

    key = jax.random.PRNGKey(9)
    K, GS = 9, 4
    x = jax.random.normal(key, (2, 20, 24, 128))
    kernel = (
        jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 128, K * GS))
        * 0.1
    )
    bias = jax.random.normal(jax.random.fold_in(key, 2), (K * GS,))
    n, keep = 3, 0.7
    samples = np.asarray(
        dropout_final_conv(
            x, kernel, bias, jnp.int32(5), n, keep,
            interpret=True, input_mode=mode,
        ),
        np.float32,
    ).reshape(n, 2, 20, 24, K, GS)
    e = np.exp(samples - samples.max(-1, keepdims=True))
    oracle = (e / e.sum(-1, keepdims=True)).mean(0).reshape(2, 20, 24, K * GS)
    got = np.asarray(
        dropout_final_probs(
            x, kernel, bias, jnp.int32(5), n, keep, GS,
            interpret=True, input_mode=mode,
        )
    )
    np.testing.assert_allclose(got, oracle, atol=2e-2)
    # proper distributions per anchor group
    g = got.reshape(2, 20, 24, K, GS)
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-5)


def test_probs_reduce_fused_matches_flat_through_model():
    """mc_forward_probs with probs_reduce=fused tracks the flat reduction
    (same pallas masks -> same samples -> close probs)."""
    import dataclasses

    from bayesod_tpu.models.retinanet import RetinaNet, init_variables, mc_forward_probs
    from bayesod_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        num_classes=3, backbone="resnet18", fpn_channels=32,
        head_depth=1, head_channels=128, norm="groupnorm",
        compute_dtype="float32", dropout_layers="last",
        head_final_backend="pallas", probs_reduce="fused",
    )
    model_f = RetinaNet(cfg=cfg, train=False)
    variables = init_variables(model_f, jax.random.PRNGKey(0), (128, 128))
    model_flat = RetinaNet(
        cfg=dataclasses.replace(cfg, probs_reduce="flat"), train=False
    )
    img = jnp.ones((1, 128, 128, 3))
    pf, df, sf = mc_forward_probs(
        model_f, variables, img, jax.random.PRNGKey(1), 4
    )
    pl_, dl, sl = mc_forward_probs(
        model_flat, variables, img, jax.random.PRNGKey(1), 4
    )
    assert pf.shape == pl_.shape
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pl_), atol=2e-2)
    np.testing.assert_allclose(np.asarray(df), np.asarray(dl), atol=1e-5)


def test_int8_close_to_bf16():
    """int8 path must track the bf16 path within quantization tolerance."""
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (1, 8, 16, 128))
    kernel = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 128, 36)) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2), (36,)) * 0.1
    a = dropout_final_conv(
        x, kernel, bias, jnp.int32(3), num_samples=2, keep_prob=1.0,
        interpret=True, dtype="bf16",
    )
    b = dropout_final_conv(
        x, kernel, bias, jnp.int32(3), num_samples=2, keep_prob=1.0,
        interpret=True, dtype="int8",
    )
    av, bv = np.asarray(a, np.float32), np.asarray(b, np.float32)
    # relative error wrt output scale
    rel = np.abs(av - bv).max() / (np.abs(av).max() + 1e-9)
    assert rel < 0.03, rel


def test_int8_with_dropout_same_masks():
    """Same seed => identical masks across dtypes (zeros in same places for
    a center-tap identity kernel)."""
    x = jnp.ones((1, 8, 16, 128))
    cout = 36
    kernel = jnp.zeros((3, 3, 128, cout)).at[1, 1, :cout, :].set(jnp.eye(cout))
    bias = jnp.zeros((cout,))
    a = dropout_final_conv(
        x, kernel, bias, jnp.int32(5), num_samples=3, keep_prob=0.6,
        interpret=True, dtype="bf16",
    )
    b = dropout_final_conv(
        x, kernel, bias, jnp.int32(5), num_samples=3, keep_prob=0.6,
        interpret=True, dtype="int8",
    )
    np.testing.assert_array_equal(np.asarray(a) == 0, np.asarray(b) == 0)


def test_probs_kernel_per_group_max_survives_cold_groups():
    """ADVICE r1: a group sitting ~200 logits below the row's hottest anchor
    must still get its own exact softmax (the old shared row max underflowed
    every lane of the cold group to an all-zero 'categorical')."""
    from bayesod_tpu.ops.pallas.fused_final import dropout_final_probs

    K, GS, CIN = 9, 4, 128
    x = jnp.zeros((1, 8, 8, CIN))
    kernel = jnp.zeros((3, 3, CIN, K * GS))
    # Group 0 sits at +200; group 5 at -5..+2 (≈207 below): exp underflows
    # against a shared max.
    bias = np.zeros(K * GS, np.float32)
    bias[0:GS] = 200.0
    bias[5 * GS : 6 * GS] = [-5.0, 0.0, 2.0, 1.0]
    got = np.asarray(
        dropout_final_probs(
            x, kernel, jnp.asarray(bias), jnp.int32(3), 2, 1.0, GS,
            interpret=True,
        )
    ).reshape(1, 8, 8, K, GS)
    sums = got.sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)  # incl. the cold group
    e = np.exp(bias[5 * GS : 6 * GS] - bias[5 * GS : 6 * GS].max())
    np.testing.assert_allclose(got[0, 0, 0, 5], e / e.sum(), atol=1e-5)
