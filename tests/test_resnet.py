"""CLIP ModifiedResNet tower shape/behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.models.resnet import AttentionPool2d, Bottleneck, ModifiedResNet


def test_bottleneck_shapes():
    blk = Bottleneck(planes=8, stride=2)
    x = jnp.ones((2, 16, 16, 8))
    vars_ = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(vars_, x)
    assert out.shape == (2, 8, 8, 32)  # stride 2, expansion 4


def test_attention_pool():
    pool = AttentionPool2d(embed_dim=32, num_heads=4, output_dim=16,
                           spacial_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 32))
    vars_ = pool.init(jax.random.PRNGKey(0), x)
    out = pool.apply(vars_, x)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_modified_resnet_tiny():
    net = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=64, heads=4,
                         input_resolution=64, width=16)
    x = jnp.ones((2, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(vars_, x)
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()
    # train mode mutates batch stats
    out2, mut = net.apply(vars_, x, True, mutable=["batch_stats"])
    assert "batch_stats" in mut
