"""Augmenter tests: shapes, frozen-arm views, GAN step semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.augment.augmenter import (AugmenterConfig, DiscriminatorConfig,
                                        apply_augmenter, apply_discriminator,
                                        augment_arms, init_augmenter,
                                        init_discriminator, load_augmenter_apply,
                                        save_augmenter)
from dvae_tpu.augment.train import train_augmenter

rng = np.random.default_rng(11)

ACFG = AugmenterConfig(noise_dim=10, latent_dim=4, input_dim=50, n_dim=20,
                       p_drop=0.2)


def test_augmenter_shapes_2d_and_3d():
    params, bn = init_augmenter(jax.random.key(0), ACFG)
    x2 = jnp.asarray(rng.random((16, 50)).astype(np.float32))
    s, out, _ = apply_augmenter(params, bn, ACFG, x2, jax.random.key(1))
    assert s.shape == (16, 4) and out.shape == (16, 50)
    x3 = jnp.broadcast_to(x2, (3, 16, 50))
    s, out, _ = apply_augmenter(params, bn, ACFG, x3, jax.random.key(2))
    assert s.shape == (3, 16, 4) and out.shape == (3, 16, 50)
    assert np.all(np.asarray(out) >= 0)  # relu output


def test_augment_arms_views_differ_across_arms():
    params, bn = init_augmenter(jax.random.key(0), ACFG)
    x = jnp.asarray(rng.random((8, 50)).astype(np.float32))
    views = augment_arms(params, bn, ACFG, jax.random.key(3), x, n_arm=3,
                         scale=0.5)
    assert views.shape == (3, 8, 50)
    v = np.asarray(views)
    assert not np.allclose(v[0], v[1])  # independent noise per arm


def test_augment_arms_matches_naive_broadcast_oracle():
    """The shared-trunk fast path (fc1–fc4 computed once) must equal the
    reference-style expand-then-forward through ``apply_augmenter`` with the
    same key — including in ZINB (n_zim>1) mode with its binary mask."""
    for cfg in (ACFG, AugmenterConfig(noise_dim=10, latent_dim=4,
                                      input_dim=50, n_dim=20, n_zim=2)):
        params, bn = init_augmenter(jax.random.key(0), cfg)
        x = jnp.asarray(rng.random((8, 50)).astype(np.float32))
        fast = augment_arms(params, bn, cfg, jax.random.key(5), x, n_arm=3,
                            scale=0.3)
        xs = jnp.broadcast_to(x, (3,) + x.shape)
        _, out, _ = apply_augmenter(params, bn, cfg, xs, jax.random.key(5),
                                    train=False, noise=True, scale=0.3)
        naive = out[..., :50]
        if cfg.n_zim > 1:
            naive = naive * (xs > 0).astype(naive.dtype)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                                   rtol=1e-5, atol=1e-6)


def test_discriminator_shapes():
    dcfg = DiscriminatorConfig(input_dim=50)
    params, bn = init_discriminator(jax.random.key(0), dcfg)
    x = jnp.asarray(rng.random((16, 50)).astype(np.float32))
    feats, probs, _ = apply_discriminator(params, bn, dcfg, x,
                                          jax.random.key(1))
    assert probs.shape == (16, 1)
    p = np.asarray(probs)
    assert ((0 <= p) & (p <= 1)).all()


def test_gan_training_reduces_recon(tmp_path):
    x = rng.gamma(2.0, 1.0, (120, 50)).astype(np.float32)
    x *= rng.random((120, 50)) > 0.6
    path = str(tmp_path / "aug.ckpt")
    params, bn, cfg, hist = train_augmenter(
        x, AugmenterConfig(noise_dim=10, latent_dim=4, input_dim=50, n_dim=20,
                           p_drop=0.2),
        n_epochs=10, batch_size=40, saving_path=path, verbose=False)
    # the differentiable part of the recon objective must improve; the
    # reference's combined recon metric includes a gradient-free binarized
    # BCE term that may drift (augmentation/train.py:108)
    assert (np.mean([h["mse_recon"] for h in hist[-3:]])
            < np.mean([h["mse_recon"] for h in hist[:3]]))
    # reload as a frozen apply closure (trainer path)
    fn = load_augmenter_apply(path)
    views = fn(jax.random.key(0), jnp.asarray(x[:8]), 2, 0.1)
    assert views.shape == (2, 8, 50)
    assert np.isfinite(np.asarray(views)).all()


def test_gan_step_bf16_matches_f32_semantics():
    """Mixed-precision GAN step (make_gan_step(bf16=True)): same structure,
    f32 master params/moments, losses within bf16 rounding of the f32
    step from an identical state."""
    import optax
    from dvae_tpu.augment.train import GanState, make_gan_step

    d_cfg = DiscriminatorConfig(input_dim=50, p_drop=0.2)
    a_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
    k = jax.random.key(0)
    ka, kd, kr = jax.random.split(k, 3)
    a_params, a_bn = init_augmenter(ka, ACFG)
    d_params, d_bn = init_discriminator(kd, d_cfg)
    x = jnp.asarray(rng.gamma(2.0, 1.0, (32, 50)).astype(np.float32))

    def run(bf16):
        st = GanState(a_params, a_bn, d_params, d_bn,
                      a_tx.init(a_params), d_tx.init(d_params), kr)
        step = jax.jit(make_gan_step(ACFG, d_cfg, a_tx, d_tx, bf16=bf16))
        st, m = step(st, x)
        return st, m

    st32, m32 = run(False)
    st16, m16 = run(True)
    # master params stay f32 and get a same-scale update
    for p32, p16 in zip(jax.tree_util.tree_leaves(st32.a_params),
                        jax.tree_util.tree_leaves(st16.a_params)):
        assert p16.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(p32), np.asarray(p16),
                                   atol=2e-3)
    # BN running stats stay f32
    for leaf in jax.tree_util.tree_leaves(st16.a_bn):
        assert leaf.dtype == jnp.float32
    # same RNG stream, so losses differ only by bf16 rounding
    np.testing.assert_allclose(float(m16.a_loss), float(m32.a_loss),
                               rtol=0.05)
    np.testing.assert_allclose(float(m16.d_loss), float(m32.d_loss),
                               rtol=0.05)


def test_train_augmenter_bf16_end_to_end(tmp_path):
    x = rng.gamma(2.0, 1.0, (120, 50)).astype(np.float32)
    x *= rng.random((120, 50)) > 0.6
    params, bn, cfg, hist = train_augmenter(
        x, ACFG, n_epochs=6, batch_size=40, verbose=False, bf16=True)
    assert np.isfinite([h["a_loss"] for h in hist]).all()
    assert (np.mean([h["mse_recon"] for h in hist[-2:]])
            < np.mean([h["mse_recon"] for h in hist[:2]]))


def test_frozen_augmenter_bf16_cast_matches_f32():
    """cast_augmenter_params(bf16) keeps augment_arms within bf16 rounding
    of the f32 path (the trainer's mixed-precision in-loop cast)."""
    from dvae_tpu.augment.augmenter import cast_augmenter_params

    params, bn = init_augmenter(jax.random.key(0), ACFG)
    x = jnp.asarray(rng.random((8, 50)).astype(np.float32))
    ref = augment_arms(params, bn, ACFG, jax.random.key(3), x, 2, 0.1)
    p16 = cast_augmenter_params(params, jnp.bfloat16)
    got = augment_arms(p16, bn, ACFG, jax.random.key(3),
                       x.astype(jnp.bfloat16), 2, 0.1)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0.1, atol=0.15)


def test_marker_gene_panels_match_reference_lists():
    """get_genes index selection matches the reference's loop-based lookup
    (augmentation/dataloader.py:6-51) and additional_gene reproduces the
    local_config.py:3-24 extra_genes list verbatim."""
    import ast
    import pathlib
    import re

    from dvae_tpu.augment.genes import (GABA_MARKERS_1, GABA_MARKERS_2,
                                        GLUTAMATERGIC_MARKERS,
                                        additional_gene, get_genes)

    ref_file = pathlib.Path("/root/reference/mmidas/utils/local_config.py")
    if ref_file.exists():
        m = re.search(r"extra_genes = (\[.*?\])\n\n", ref_file.read_text(),
                      re.S)
        assert m is not None, "reference extra_genes list not found"
        assert additional_gene() == ast.literal_eval(m.group(1))
    else:
        assert len(additional_gene()) == 117

    gene_id = ["GeneX", "Sst", "Cux2", "GeneY", "Sirt4", "Lamp5", "GeneZ"]
    # naive per-panel loop lookup (the reference's semantics)
    marker_idx = []
    for panel in (GLUTAMATERGIC_MARKERS, GABA_MARKERS_1, GABA_MARKERS_2):
        for g in panel:
            marker_idx += [i for i, item in enumerate(gene_id) if g == item]
    want = np.unique(np.concatenate([np.arange(3), np.array(marker_idx)]))
    np.testing.assert_array_equal(get_genes(gene_id, n_genes=3), want)
    # n_genes=0 -> every column
    np.testing.assert_array_equal(get_genes(gene_id, 0),
                                  np.arange(len(gene_id)))


def test_get_data_yields_paired_binarized_batches():
    from dvae_tpu.augment.genes import get_data

    x = rng.random((25, 6)).astype(np.float32)
    batches = list(get_data(x, batch_size=10, training=False))
    assert len(batches) == 2  # drop_last
    for xb, bb in batches:
        np.testing.assert_array_equal(bb, (xb > 1e-1).astype(np.float32))
