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


def test_smartseq_noise_off_equals_zero_scale():
    """variant='smartseq' has no plain branch: noise=False must be the
    zero-noise fc5 path (NOT silent full-scale noise)."""
    params, bn = init_augmenter(jax.random.key(0), ACFG)
    x = jnp.asarray(rng.random((8, 50)).astype(np.float32))
    k = jax.random.key(4)
    _, off, _ = apply_augmenter(params, bn, ACFG, x, k, noise=False,
                                scale=5.0)
    _, zero, _ = apply_augmenter(params, bn, ACFG, x, k, noise=True,
                                 scale=0.0)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(zero))
    _, on, _ = apply_augmenter(params, bn, ACFG, x, k, noise=True,
                               scale=1.0)
    assert not np.allclose(np.asarray(off), np.asarray(on))


def test_generic_plain_branch_keeps_own_bn_stats():
    """The generic variant's fc5_plain branch must update bn5_plain, not
    share bn5 with the noise branch (reference batch_fc5 vs batch_fc5n)."""
    cfg = AugmenterConfig(noise_dim=10, latent_dim=4, input_dim=50,
                          n_dim=20, variant="generic")
    params, bn = init_augmenter(jax.random.key(0), cfg)
    assert "bn5_plain" in bn and "fc5_plain" in params
    x = jnp.asarray(rng.random((16, 50)).astype(np.float32))
    _, _, bn_noise = apply_augmenter(params, bn, cfg, x, jax.random.key(1),
                                     train=True, noise=True)
    _, _, bn_plain = apply_augmenter(params, bn, cfg, x, jax.random.key(1),
                                     train=True, noise=False)
    # noise pass touches bn5 only; plain pass touches bn5_plain only
    assert not np.allclose(np.asarray(bn_noise["bn5"]["mean"]),
                           np.asarray(bn["bn5"]["mean"]))
    np.testing.assert_array_equal(np.asarray(bn_noise["bn5_plain"]["mean"]),
                                  np.asarray(bn["bn5_plain"]["mean"]))
    assert not np.allclose(np.asarray(bn_plain["bn5_plain"]["mean"]),
                           np.asarray(bn["bn5_plain"]["mean"]))
    np.testing.assert_array_equal(np.asarray(bn_plain["bn5"]["mean"]),
                                  np.asarray(bn["bn5"]["mean"]))


def test_zinb_mode_gets_dropout_head_and_small_dataset_clamps(tmp_path):
    x = rng.gamma(2.0, 1.0, (50, 30)).astype(np.float32)
    x *= rng.random((50, 30)) > 0.6
    params, bn, cfg, hist = train_augmenter(
        x, AugmenterConfig(noise_dim=6, latent_dim=3, input_dim=30,
                           n_dim=10),
        n_epochs=2, batch_size=1000, mode="ZINB", verbose=False)
    assert cfg.n_zim == 2 and "fc11_p" in params   # head actually trained
    assert np.isfinite([h["a_loss"] for h in hist]).all()


def test_generator_true_topology():
    from dvae_tpu.augment.augmenter import (GeneratorConfig, apply_generator,
                                            init_generator)

    cfg = GeneratorConfig(latent_dim=4, input_dim=40, n_dim=12)
    params, bn = init_generator(jax.random.key(0), cfg)
    # reference Generator layer set: no fc4/fc5/fc8/fc9, mu from n_dim
    assert set(params) == {"fc1", "fc2", "fc3", "fc_mu", "fc_sigma",
                           "fc6", "fc7", "fc10", "fc11"}
    assert params["fc1"]["w"].shape == (40, 12)
    assert params["fc_mu"]["w"].shape == (12, 4)
    x = jnp.asarray(rng.random((8, 40)).astype(np.float32))
    s, out, _ = apply_generator(params, bn, cfg, x, jax.random.key(1))
    assert s.shape == (8, 4) and out.shape == (8, 40)
    zcfg = GeneratorConfig(latent_dim=4, input_dim=40, n_dim=12, n_zim=2)
    zp, zbn = init_generator(jax.random.key(0), zcfg)
    _, zout, _ = apply_generator(zp, zbn, zcfg, x, jax.random.key(1))
    assert zout.shape == (8, 80)  # [x_mu, x_p]
