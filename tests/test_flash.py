"""Flash-attention wrapper parity (ops/flash.py).

Off-TPU the wrapper runs the identical Pallas kernels under the TPU
interpreter, so these tests exercise the real kernel code path, including
the padding + SegmentIds masking for the ViT's non-multiple-of-128 sequence
(1025 tokens) and the torch key_padding_mask semantics used by
use_rand_views (models/attention.py kv_mask).
"""

import jax
import jax.numpy as jnp
import numpy as np
from lara_tpu.ops.flash import flash_mha


def dense_mha(q, k, v, kv_mask=None):
    """Plain softmax attention in f32 — the semantics flash_mha must match."""
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))


def make_qkv(b=2, l=200, h=2, hd=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, l, h, hd)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


def test_flash_matches_dense_padded_seq():
    # 200 is not a multiple of the 128 kernel block: exercises the padding
    # + segment-ids path that the ViT's 1025-token sequence needs
    q, k, v = make_qkv()
    out = flash_mha(q, k, v)
    ref = dense_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_kv_mask_matches_dense():
    q, k, v = make_qkv(seed=1)
    mask = jax.random.uniform(jax.random.PRNGKey(7), (2, 200)) > 0.3
    mask = mask.at[:, 0].set(True)  # every row keeps >=1 key
    out = flash_mha(q, k, v, kv_mask=mask)
    ref = dense_mha(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_grads_match_dense():
    q, k, v = make_qkv(b=1, l=130, seed=2)

    def loss_flash(q, k, v):
        return (flash_mha(q, k, v) ** 2).sum()

    def loss_dense(q, k, v):
        return (dense_mha(q, k, v) ** 2).sum()

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_mha_module_flash_parity():
    """MultiHeadAttention(use_flash=True) ≡ the einsum path, same params."""
    from lara_tpu.models.attention import MultiHeadAttention

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 150, 64), jnp.float32)
    kwargs = dict(dim=64, num_heads=2, use_bias=True, dtype=jnp.float32)
    ref_mod = MultiHeadAttention(**kwargs)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(params, x)
    out = MultiHeadAttention(use_flash=True, **kwargs).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_vit_flash_parity():
    """DinoViT(use_flash=True) plumb-through (scan + remat + CLS padding)."""
    from lara_tpu.models.vit import DinoViT

    img = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    # remat=False: the interpret-mode kernel carries an IO effect that
    # jax.remat's partial-eval rejects (ops/flash.py docstring); on real TPU
    # the compiled kernel has no effect and composes with remat.
    kwargs = dict(patch_size=16, dim=64, depth=2, num_heads=2,
                  dtype=jnp.float32, remat=False)
    ref_mod = DinoViT(**kwargs)
    params = ref_mod.init(jax.random.PRNGKey(0), img)
    ref = ref_mod.apply(params, img)
    out = DinoViT(use_flash=True, **kwargs).apply(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=3e-4)
