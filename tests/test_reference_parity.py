"""Numerical parity against the ACTUAL reference implementation.

Every other test checks this framework against transcribed oracles; this
file checks it against the reference itself: it imports the real torch
``mixVAE_model`` from the reference tree, transfers its weights into the
stacked-arm pytree via ``utils/torch_import``, and asserts that the
deterministic forward outputs (eval mode: dropout off, BN running stats,
noiseless hard gumbel — reference mmidas/nn_model.py:297-368) and the full
9-tuple loss (nn_model.py:495-598, including the binarized-BCE log-clamp
quirk) agree to f32 tolerance.

Skipped when the reference tree is not available.

Not covered here: the taxonomy/HTree stack — the reference's own
implementation does not run under modern deps (pandas 3 copy-on-write
breaks its read-only-view mutations at taxonomy.py:67, and numpy 2 removed
the ``np.NaN`` it uses at taxonomy.py:506), so it cannot be executed for
comparison; tests/test_taxonomy.py pins that stack against hand-built
synthetic trees instead.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = os.environ.get("DVAE_REFERENCE", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "mmidas")),
    reason="reference tree not available")

A, B, C, D, FC, LOWD, S = 2, 16, 10, 64, 16, 8, 2
TAU = 0.1


@pytest.fixture(scope="module")
def ref_side():
    """(torch model in eval mode, its forward outputs, the input batch)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch as th
    from mmidas.nn_model import mixVAE_model

    th.manual_seed(0)
    model = mixVAE_model(
        input_dim=D, fc_dim=FC, n_categories=C, state_dim=S, lowD_dim=LOWD,
        x_drop=0.5, s_drop=0.2, n_arm=A, lam=1, lam_pc=1, tau=TAU,
        beta=1.0, hard=False, variational=True, device="cpu", eps=1e-8,
        momentum=0.01, ref_prior=False, loss_mode="MSE")
    # burn a few train-mode forwards so BN running stats are non-trivial
    model.train()
    with th.no_grad():
        for i in range(3):
            xb = th.rand(B, D, generator=th.Generator().manual_seed(i))
            model(xb.expand(A, -1, -1), 1.0, [])
    model.eval()

    x = th.rand(B, D, generator=th.Generator().manual_seed(99))
    with th.no_grad():
        outs = model(x.expand(A, -1, -1), 1.0, [], eval=True)
    return model, outs, x.numpy()


@pytest.fixture(scope="module")
def ours_side(ref_side):
    """(cfg, imported stacked params/bn, our eval forward outputs)."""
    import jax
    from dvae_tpu.config import VAEConfig
    from dvae_tpu.models import mixvae
    from dvae_tpu.utils.torch_import import mixvae_from_state_dict

    model, _, x = ref_side
    params, bn, mask, inferred = mixvae_from_state_dict(model.state_dict())
    assert inferred["n_arm"] == A and inferred["n_categories"] == C
    cfg = VAEConfig(n_categories=C, input_dim=D, fc_dim=FC, lowD_dim=LOWD,
                    state_dim=S, n_arm=A, tau=TAU, eps=1e-8,
                    fused_recon=False, fused_encoder=False)
    params = jax.tree_util.tree_map(lambda v: np.asarray(v), params)
    xs = np.repeat(x[None], A, axis=0)
    outs, _ = mixvae.apply(params, bn, cfg, xs, jax.random.key(0),
                           temp=1.0, train=False)
    return cfg, params, bn, outs


def _close(ours, ref_t, name, rtol=2e-4, atol=2e-5):
    np.testing.assert_allclose(
        np.asarray(ours), ref_t.detach().numpy(), rtol=rtol, atol=atol,
        err_msg=f"{name} diverges from the reference implementation")


class TestForwardParity:
    def test_deterministic_fields_match(self, ref_side, ours_side):
        """x_low, softmax probs, tau-sharpened posterior, hard sample,
        state mean/logvar — every noise-free forward output matches the
        reference's eval-mode forward on the same imported weights."""
        _, ref, _ = ref_side
        (x_recs, _, _, x_lows, cs, s_smps, c_smps,
         s_means, s_logvars, c_probs) = ref
        _, _, _, ours = ours_side
        for a in range(A):
            _close(ours.x_low[a], x_lows[a], f"x_low[{a}]")
            _close(ours.c[a], cs[a], f"c[{a}]")
            _close(ours.c_smp[a], c_smps[a], f"c_smp[{a}]")
            _close(ours.s_mean[a], s_means[a], f"s_mean[{a}]")
            _close(ours.s_logvar[a], s_logvars[a], f"s_logvar[{a}]")

    def test_decoder_matches_on_same_state_sample(self, ref_side, ours_side):
        """Driving BOTH decoders with the same (c_smp, s=s_mean) removes
        the reparameterization noise: reconstructions must agree."""
        import jax
        import torch as th
        from dvae_tpu.models.mixvae import _decode_arm

        model, ref, _ = ref_side
        cfg, params, _, ours = ours_side
        c_smps, s_means = ref[6], ref[7]
        for a in range(A):
            with th.no_grad():
                ref_rec = model.decoder(c_smps[a], s_means[a], a)
            p_a = jax.tree_util.tree_map(lambda v: v[a], params)
            our_rec, _, _ = _decode_arm(p_a, np.asarray(ours.c_smp[a]),
                                        np.asarray(ours.s_mean[a]),
                                        jax.random.key(0), cfg, train=False)
            _close(our_rec, ref_rec, f"x_rec[{a}]", rtol=5e-4, atol=5e-4)


class TestLossParity:
    def test_nine_tuple_matches(self, ref_side, ours_side):
        """Same tensors into both loss functions: total, per-arm rec
        (incl. the binarized-BCE log-clamp), coupling, entropy, simplex
        distance, L2 distance, and per-arm KL all agree."""
        import jax
        import torch as th
        from dvae_tpu.models.losses import mixvae_loss
        from dvae_tpu.models.mixvae import MixVAEOutputs, _decode_arm

        model, ref, x = ref_side
        cfg, params, _, ours = ours_side
        c_smps, s_means, s_logvars, cs = ref[6], ref[7], ref[8], ref[4]
        # deterministic reconstructions: decode s_mean on both sides
        ref_recs = []
        with th.no_grad():
            for a in range(A):
                ref_recs.append(model.decoder(c_smps[a], s_means[a], a))
        our_recs = []
        for a in range(A):
            p_a = jax.tree_util.tree_map(lambda v: v[a], params)
            our_recs.append(_decode_arm(
                p_a, np.asarray(ours.c_smp[a]), np.asarray(ours.s_mean[a]),
                jax.random.key(0), cfg, train=False)[0])

        xs_t = [th.as_tensor(x) for _ in range(A)]
        ref_loss = model.loss(ref_recs, [], [], xs_t,
                              s_means, s_logvars, cs, c_smps)
        (r_total, r_recs, r_joint, r_ent, r_cdist, r_cl2, r_kls, _,
         _) = ref_loss

        zeros = np.zeros((A, B, D), np.float32)
        outs = MixVAEOutputs(
            x_rec=np.stack([np.asarray(r) for r in our_recs]),
            p_x=zeros, r_x=zeros,
            x_low=np.asarray(ours.x_low), c=np.asarray(ours.c),
            s_smp=np.asarray(ours.s_mean), c_smp=np.asarray(ours.c_smp),
            s_mean=np.asarray(ours.s_mean),
            s_logvar=np.asarray(ours.s_logvar),
            c_prob=np.asarray(ours.c_prob))
        xs = np.repeat(x[None], A, axis=0)
        got = mixvae_loss(cfg, outs, xs)

        assert float(got.total) == pytest.approx(float(r_total), rel=2e-4)
        _close(got.loss_rec, r_recs, "loss_rec", rtol=2e-4, atol=1e-4)
        assert float(got.loss_joint) == pytest.approx(float(r_joint),
                                                      rel=2e-4)
        assert float(got.neg_entropy) == pytest.approx(float(r_ent),
                                                       rel=2e-4)
        assert float(got.c_dist) == pytest.approx(float(r_cdist), rel=2e-4)
        assert float(got.c_l2_dist) == pytest.approx(float(r_cl2), rel=2e-4)
        ref_kl = np.array([float(k) for k in r_kls])
        np.testing.assert_allclose(np.asarray(got.kl), ref_kl,
                                   rtol=2e-4, atol=1e-5)


class TestAugmenterParity:
    def test_smartseq_forward_matches_with_noise_off(self, tmp_path,
                                                     monkeypatch):
        """The real reference Augmenter_smartseq (batched arm-major forward
        with its permute-BatchNorm trick, udagan.py:284-309) vs our
        trunk-once augment_arms on imported weights.  Noise is removed on
        both sides (scale=0 kills the z path; the reparameterization draw
        is patched to its mean), making the forward deterministic."""
        import jax
        import jax.numpy as jnp
        import torch as th
        if REF not in sys.path:
            sys.path.insert(0, REF)
        import mmidas.augmentation.udagan as udagan

        NZ, Z, Dg, H, Bn, Aa = 6, 4, 60, 20, 32, 3
        th.manual_seed(1)
        net = udagan.Augmenter_smartseq(noise_dim=NZ, latent_dim=Z,
                                        input_dim=Dg, n_dim=H)
        # burn real BN running stats, then freeze (the in-loop augmenter is
        # .eval(), reference cpl_mixvae.py:184)
        net.train()
        with th.no_grad():
            for i in range(3):
                net(th.rand(Bn, Dg,
                            generator=th.Generator().manual_seed(i)), False)
        net.eval()

        ckpt = {"netA": net.state_dict(), "netD": {}, "optimA": {},
                "optimD": {}, "parameters": {"num_n": NZ, "num_z": Z,
                                             "n_features": Dg, "n_dim": H}}
        pth = str(tmp_path / "aug.pth")
        th.save(ckpt, pth)

        from dvae_tpu.augment.augmenter import augment_arms, load_augmenter
        from dvae_tpu.utils.torch_import import import_augmenter_checkpoint
        params, bn, acfg = load_augmenter(import_augmenter_checkpoint(pth))

        x = th.rand(Bn, Dg, generator=th.Generator().manual_seed(77))
        monkeypatch.setattr(udagan, "reparam_trick",
                            lambda mu, std, device: mu)
        with th.no_grad():
            _, ref_out = net(x.expand(Aa, -1, -1), True, 0.0)

        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
        ours = augment_arms(params, bn, acfg, jax.random.key(0),
                            jnp.asarray(x.numpy()), n_arm=Aa, scale=0.0)
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg="augmenter forward diverges from "
                                           "the reference implementation")


def test_zinb_loss_matches_reference():
    """Our zinb_loss vs the reference's own free function
    (mmidas/nn_model.py:642-676) on identical tensors."""
    import torch as th
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from mmidas.nn_model import zinb_loss as ref_zinb
    from dvae_tpu.models.losses import zinb_loss as our_zinb

    rng = np.random.default_rng(5)
    shape = (8, 40)
    x = np.log1p(rng.poisson(3.0, shape)).astype(np.float32)   # log1p counts
    rec = rng.random(shape, np.float32) * 4 + 0.5              # NB rate head
    p = rng.random(shape, np.float32) * 0.8 + 0.05
    z = rng.random(shape, np.float32) * 0.8 + 0.05
    ref = float(ref_zinb(th.as_tensor(rec), th.as_tensor(p),
                         th.as_tensor(z), th.as_tensor(x)))
    got = float(our_zinb(rec, p, z, x))
    assert got == pytest.approx(ref, rel=1e-5)


def test_gumbel_and_uniform_reparam_match_with_shared_noise(ref_side,
                                                            monkeypatch):
    """The RNG-dependent paths, driven with IDENTICAL uniform noise on both
    sides: gumbel-softmax sampling (log(-log(U+eps)+eps) construction,
    reference nn_model.py:430-455), the ST-hard forward value, and the
    uniform-noise reparameterization quirk (torch.rand_like at :427,
    ReparamNoise.UNIFORM here)."""
    import jax
    import jax.numpy as jnp
    import torch as th
    from dvae_tpu.models import sampling

    model, _, _ = ref_side
    rng = np.random.default_rng(11)
    U = rng.random((B, C)).astype(np.float32)
    phi = np.exp(rng.random((B, C), np.float32))
    phi = (phi / phi.sum(-1, keepdims=True)).astype(np.float32)
    phi_t = th.as_tensor(phi)

    monkeypatch.setattr(th, "rand",
                        lambda *s, **kw: th.as_tensor(U.reshape(s if len(s) > 1
                                                                else s[0])))
    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape, dtype=jnp.float32:
                        jnp.asarray(U.reshape(shape), dtype))

    ref_soft = model.gumbel_softmax_sample(phi_t, 0.7).numpy()
    our_soft = np.asarray(sampling.gumbel_softmax_sample(
        jax.random.key(0), phi, 0.7, model.eps))
    np.testing.assert_allclose(our_soft, ref_soft, rtol=2e-4, atol=2e-5)

    ref_hard = model.gumbel_softmax(phi_t, 1, C, 0.7, hard=True)
    our_hard = np.asarray(sampling.gumbel_softmax(
        jax.random.key(0), phi, 0.7, model.eps, hard=True))
    np.testing.assert_allclose(our_hard.reshape(-1, C),
                               ref_hard.detach().numpy(), rtol=2e-4,
                               atol=2e-5)

    mu = rng.random((B, C), np.float32)
    logvar = (rng.random((B, C), np.float32) - 0.5).astype(np.float32)
    monkeypatch.setattr(th, "rand_like",
                        lambda t, **kw: th.as_tensor(U.reshape(t.shape)))
    ref_s = model.reparameterize(th.as_tensor(mu),
                                 th.as_tensor(logvar)).numpy()
    our_s = np.asarray(sampling.reparameterize(
        jax.random.key(0), mu, logvar, noise=sampling.ReparamNoise.UNIFORM))
    np.testing.assert_allclose(our_s, ref_s, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def ref_utils():
    """The reference's real ``_utils`` module (confmat/consensus kit).

    Its import chain pulls anndata/toml through dataloader/tools/_evals —
    none of which the consensus kit itself uses — so those three modules
    are stubbed before import."""
    import types
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, attrs in [("mmidas.utils.dataloader",
                         ["load_data", "get_loaders"]),
                        ("mmidas._evals", ["evals2"]),
                        ("mmidas.utils.tools", ["get_paths"])]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, None)
            sys.modules[name] = m
    import mmidas._utils as u
    return u


class TestConsensusKitParity:
    """eval/metrics.py vs the reference's real _utils implementations."""

    def test_confmat_normalize_mean_reassign_ecdf(self, ref_utils):
        from dvae_tpu.eval import metrics as m

        rng = np.random.default_rng(3)
        K, N = 9, 500
        l1 = rng.integers(0, K, N)
        l2 = rng.integers(0, K, N)
        ref_cm = ref_utils.compute_confmat(l1, l2, K)
        our_cm = m.compute_confmat(l1, l2, K)
        np.testing.assert_array_equal(our_cm, ref_cm)

        np.testing.assert_allclose(m.confmat_normalize(our_cm),
                                   ref_utils.confmat_normalize(ref_cm.copy()))
        assert m.confmat_mean(m.confmat_normalize(our_cm)) == pytest.approx(
            ref_utils.confmat_mean(ref_utils.confmat_normalize(ref_cm.copy())))

        x = rng.random((6, 6))
        np.testing.assert_array_equal(m.reassign(x), ref_utils.reassign(x))

        labels = rng.integers(0, 5, 200)
        np.testing.assert_allclose(m.ecdf(labels), ref_utils.ecdf(labels))

    def test_classify_and_parse_epoch(self, ref_utils):
        from dvae_tpu.eval import metrics as m

        rng = np.random.default_rng(4)
        probs = rng.random((50, 7))
        np.testing.assert_array_equal(m.classify(probs),
                                      ref_utils.classify(probs))
        s = "cpl_mixVAE_model_epoch_4200.pth"
        assert m.parse_epoch(s) == ref_utils.parse_epoch(s)


def test_generic_augmenter_import_and_noise_off_forward(tmp_path,
                                                        monkeypatch):
    """A checkpoint of the reference's GENERIC Augmenter (udagan.py:16-118
    — dual fc5/fc5n paths; the family dist/train_agumenter.py builds) must
    import with the right layout (our fc5 ← ref fc5n, fc5_plain ← fc5,
    per-branch BN stats) and reproduce the deterministic noise-off
    forward."""
    import jax
    import jax.numpy as jnp
    import torch as th
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import mmidas.augmentation.udagan as udagan

    NZ, Z, Dg, H, Bn = 6, 4, 60, 20, 32
    th.manual_seed(3)
    net = udagan.Augmenter(noise_dim=NZ, latent_dim=Z, input_dim=Dg,
                           n_dim=H, n_zim=1, p_drop=0.2)
    net.train()
    with th.no_grad():
        for i in range(3):
            x = th.rand(Bn, Dg, generator=th.Generator().manual_seed(i))
            z = th.randn(Bn, NZ, generator=th.Generator().manual_seed(i))
            net(x, z, True, "cpu")
            net(x, z, False, "cpu")
    net.eval()

    pth = str(tmp_path / "aug_generic.pth")
    th.save({"netA": net.state_dict(), "netD": {}, "optimA": {},
             "optimD": {}, "parameters": {"num_n": NZ, "num_z": Z,
                                          "n_features": Dg}}, pth)

    from dvae_tpu.augment.augmenter import apply_augmenter, load_augmenter
    from dvae_tpu.utils.torch_import import import_augmenter_checkpoint
    params, bn, acfg = load_augmenter(import_augmenter_checkpoint(pth))
    assert acfg.variant == "generic" and acfg.n_dim == H
    assert "fc5_plain" in params and "bn5_plain" in bn
    assert params["fc5"]["w"].shape == (H + NZ, H // 5)
    assert params["fc5_plain"]["w"].shape == (H, H // 5)

    x = th.rand(Bn, Dg, generator=th.Generator().manual_seed(9))
    z = th.zeros(Bn, NZ)
    monkeypatch.setattr(udagan, "reparam_trick", lambda mu, std, dev: mu)
    with th.no_grad():
        _, ref_out = net(x, z, False, "cpu")

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
    _, ours, _ = apply_augmenter(params, bn, acfg,
                                 jnp.asarray(x.numpy()),
                                 jax.random.key(0), train=False,
                                 noise=False)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                               rtol=2e-4, atol=2e-5)
