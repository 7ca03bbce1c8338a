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


# ---------------------------------------------------------------------------
# Config-sweep parity: the fixture above pins ONE shape; these cases walk the
# reference's configuration space (arm count, odd layer widths, coupling /
# KL hyper-parameters, the ref_prior concat branch) and assert the same
# forward (and, where the reference's own loss can execute, loss) parity at
# each point.  Two reference limitations bound the sweep — both verified
# against /root/reference/mmidas/nn_model.py directly:
#   * loss at A=1 divides by len(c_dists)==0 (":592-593") → forward-only
#     here;
#   * loss with ref_prior=True trips the bare ``assert not self.ref_prior``
#     (":578") right after its own ref_prior branch → forward-only here
#     (tests/test_model.py pins our ref_prior loss against the documented
#     pre-refactor semantics instead).
# ---------------------------------------------------------------------------

_SWEEP = [
    # name,            A  B   C   D   FC  LOWD S  tau   beta lam lam_pc ref_prior check_loss
    ("single_arm",      1, 12, 10, 40, 12, 6,  2, 0.1,  1.0, 1,  1,     False,    False),
    ("three_arms",      3, 12, 10, 40, 12, 6,  2, 0.1,  1.0, 1,  1,     False,    True),
    ("odd_dims",        2, 11,  7, 50, 11, 5,  3, 0.1,  1.0, 1,  1,     False,    True),
    ("hyperparams",     2, 12, 10, 40, 12, 6,  2, 0.67, 2.0, 5,  2,     False,    True),
    ("ref_prior_fwd",   2, 12, 10, 40, 12, 6,  2, 0.1,  1.0, 1,  1,     True,     False),
]


def _build_sides(A, B, C, D, FC, LOWD, S, tau, beta, lam, lam_pc, ref_prior):
    """Reference model + our imported twin at an arbitrary config point."""
    import jax
    import jax.numpy as jnp
    import torch as th
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from mmidas.nn_model import mixVAE_model

    from dvae_tpu.config import VAEConfig
    from dvae_tpu.models import mixvae
    from dvae_tpu.utils.torch_import import mixvae_from_state_dict

    th.manual_seed(7)
    model = mixVAE_model(
        input_dim=D, fc_dim=FC, n_categories=C, state_dim=S, lowD_dim=LOWD,
        x_drop=0.2, s_drop=0.1, n_arm=A, lam=lam, lam_pc=lam_pc, tau=tau,
        beta=beta, hard=False, variational=True, device="cpu", eps=1e-8,
        momentum=0.01, ref_prior=ref_prior, loss_mode="MSE")

    prior_t = []
    prior_np = None
    if ref_prior:
        pr = th.rand(B, C, generator=th.Generator().manual_seed(5))
        prior_t = pr / pr.sum(1, keepdim=True)
        prior_np = prior_t.numpy()

    # burn train-mode forwards so BN running stats are non-trivial
    model.train()
    with th.no_grad():
        for i in range(2):
            xb = th.rand(B, D, generator=th.Generator().manual_seed(i))
            model(xb.expand(A, -1, -1), 1.0, prior_t)
    model.eval()

    x = th.rand(B, D, generator=th.Generator().manual_seed(99))
    with th.no_grad():
        ref_outs = model(x.expand(A, -1, -1), 1.0, prior_t, eval=True)

    params, bn, _, inferred = mixvae_from_state_dict(model.state_dict())
    assert inferred["n_arm"] == A and inferred["n_categories"] == C
    cfg = VAEConfig(n_categories=C, input_dim=D, fc_dim=FC, lowD_dim=LOWD,
                    state_dim=S, n_arm=A, tau=tau, beta=beta, lam=lam,
                    lam_pc=lam_pc, ref_prior=ref_prior, eps=1e-8,
                    fused_recon=False, fused_encoder=False)
    params = jax.tree_util.tree_map(np.asarray, params)
    xs = np.repeat(x.numpy()[None], A, axis=0)
    our_outs, _ = mixvae.apply(
        params, bn, cfg, jnp.asarray(xs), jax.random.key(0), temp=1.0,
        train=False,
        prior_c=jnp.asarray(prior_np) if ref_prior else None)
    return model, ref_outs, cfg, params, our_outs, x.numpy()


@pytest.mark.parametrize(
    "name,A_,B_,C_,D_,FC_,LOWD_,S_,tau,beta,lam,lam_pc,ref_prior,check_loss",
    _SWEEP, ids=[c[0] for c in _SWEEP])
def test_config_sweep_parity(name, A_, B_, C_, D_, FC_, LOWD_, S_, tau, beta,
                             lam, lam_pc, ref_prior, check_loss):
    """Eval-forward (all deterministic fields + s_mean-driven decoder) and —
    where the reference loss can run — full 9-tuple loss parity at each
    sweep point."""
    import jax
    import torch as th

    from dvae_tpu.models.losses import mixvae_loss
    from dvae_tpu.models.mixvae import MixVAEOutputs, _decode_arm

    model, ref, cfg, params, ours, x = _build_sides(
        A_, B_, C_, D_, FC_, LOWD_, S_, tau, beta, lam, lam_pc, ref_prior)
    (_, _, _, x_lows, cs, _, c_smps, s_means, s_logvars, _) = ref

    for a in range(A_):
        _close(ours.x_low[a], x_lows[a], f"{name}: x_low[{a}]")
        _close(ours.c[a], cs[a], f"{name}: c[{a}]")
        _close(ours.c_smp[a], c_smps[a], f"{name}: c_smp[{a}]")
        _close(ours.s_mean[a], s_means[a], f"{name}: s_mean[{a}]")
        _close(ours.s_logvar[a], s_logvars[a], f"{name}: s_logvar[{a}]")

    # drive both decoders with (c_smp, s_mean): noise-free reconstructions
    ref_recs, our_recs = [], []
    for a in range(A_):
        with th.no_grad():
            ref_recs.append(model.decoder(c_smps[a], s_means[a], a))
        p_a = jax.tree_util.tree_map(lambda v: v[a], params)
        our_rec, _, _ = _decode_arm(p_a, np.asarray(ours.c_smp[a]),
                                    np.asarray(ours.s_mean[a]),
                                    jax.random.key(0), cfg, train=False)
        our_recs.append(our_rec)
        _close(our_rec, ref_recs[a], f"{name}: x_rec[{a}]",
               rtol=5e-4, atol=5e-4)

    if not check_loss:
        return

    xs_t = [th.as_tensor(x) for _ in range(A_)]
    (r_total, r_recs, r_joint, r_ent, r_cdist, r_cl2, r_kls, _,
     _) = model.loss(ref_recs, [], [], xs_t, s_means, s_logvars, cs, c_smps)

    zeros = np.zeros((A_, B_, D_), np.float32)
    outs = MixVAEOutputs(
        x_rec=np.stack([np.asarray(r) for r in our_recs]),
        p_x=zeros, r_x=zeros,
        x_low=np.asarray(ours.x_low), c=np.asarray(ours.c),
        s_smp=np.asarray(ours.s_mean), c_smp=np.asarray(ours.c_smp),
        s_mean=np.asarray(ours.s_mean), s_logvar=np.asarray(ours.s_logvar),
        c_prob=np.asarray(ours.c_prob))
    got = mixvae_loss(cfg, outs, np.repeat(x[None], A_, axis=0))

    assert float(got.total) == pytest.approx(float(r_total), rel=3e-4), name
    _close(got.loss_rec, r_recs, f"{name}: loss_rec", rtol=3e-4, atol=1e-4)
    assert float(got.loss_joint) == pytest.approx(float(r_joint), rel=3e-4)
    assert float(got.neg_entropy) == pytest.approx(float(r_ent), rel=3e-4)
    assert float(got.c_dist) == pytest.approx(float(r_cdist), rel=3e-4)
    assert float(got.c_l2_dist) == pytest.approx(float(r_cl2), rel=3e-4)
    np.testing.assert_allclose(np.asarray(got.kl),
                               np.array([float(k) for k in r_kls]),
                               rtol=3e-4, atol=1e-5)


def test_gradient_parity_full_loss(monkeypatch):
    """d(total)/d(every weight and bias): torch autograd vs ``jax.grad``
    on the imported weights, through the identical deterministic graph
    (eval-mode forward — dropout off, BN running stats, noise-free hard
    gumbel — with the state reparameterization patched to its mean on both
    sides).  Value parity cannot see gradient wiring; this pins it: the
    straight-through gumbel estimator (reference nn_model.py:489-493 vs
    sampling.py's stop_gradient construction), the zero-gradient binarized
    -BCE quirk (nn_model.py:544-545), and every coupling/KL backward path
    land on exactly the same d(total)/dθ.

    Runs at a well-conditioned config point (tau=1.0 so the categorical
    posterior stays smooth, eps=1e-3): at the production tau=0.1/eps=1e-8
    the coupling loss's ``inv_var`` weights (nn_model.py:75-77,
    sqrt(1/(batch-var + eps))) sit on near-zero batch variances whose
    backward amplifies f32 rounding ~1e5× — both frameworks agree on the
    gradient's structure there but f32 element-wise comparison is
    meaningless.  Wiring bugs (a missing term, a wrong straight-through
    path, a mis-scaled coupling) are condition-independent, so this point
    pins them at f32 tolerance."""
    import jax
    import jax.numpy as jnp
    import torch as th
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from mmidas.nn_model import mixVAE_model

    from dvae_tpu.config import VAEConfig
    from dvae_tpu.models import mixvae
    from dvae_tpu.models.losses import mixvae_loss
    from dvae_tpu.utils.torch_import import mixvae_from_state_dict

    Ag, Bg, Cg, Dg, FCg, LOWDg, Sg = 2, 24, 10, 40, 12, 6, 2
    TAUg, EPSg = 1.0, 1e-3

    th.manual_seed(13)
    model = mixVAE_model(
        input_dim=Dg, fc_dim=FCg, n_categories=Cg, state_dim=Sg,
        lowD_dim=LOWDg, x_drop=0.2, s_drop=0.1, n_arm=Ag, lam=1, lam_pc=1,
        tau=TAUg, beta=1.0, hard=False, variational=True, device="cpu",
        eps=EPSg, momentum=0.01, ref_prior=False, loss_mode="MSE")
    model.train()
    with th.no_grad():
        for i in range(2):
            xb = th.rand(Bg, Dg, generator=th.Generator().manual_seed(i))
            model(xb.expand(Ag, -1, -1), 1.0, [])
    model.eval()

    # --- torch side: eval-mode forward WITH grad, mean reparam
    monkeypatch.setattr(model, "reparameterize", lambda mu, logvar: mu)
    xt = th.rand(Bg, Dg, generator=th.Generator().manual_seed(99))
    outs = model(xt.expand(Ag, -1, -1), 1.0, [], eval=True)
    (x_recs, _, _, _, cs, _, c_smps, s_means, s_logvars, _) = outs
    ref_total = model.loss(list(x_recs), [], [], [xt] * Ag,
                           list(s_means), list(s_logvars), list(cs),
                           list(c_smps))[0]
    ref_total.backward()
    ref_grads = {n: p.grad for n, p in model.named_parameters()}

    # --- jax side: same graph on the imported weights
    params, bn, _, _ = mixvae_from_state_dict(model.state_dict())
    cfg = VAEConfig(n_categories=Cg, input_dim=Dg, fc_dim=FCg,
                    lowD_dim=LOWDg, state_dim=Sg, n_arm=Ag, tau=TAUg,
                    eps=EPSg, fused_recon=False, fused_encoder=False)
    xs = jnp.asarray(np.repeat(xt.numpy()[None], Ag, axis=0))
    monkeypatch.setattr(mixvae, "reparameterize",
                        lambda key, mu, logvar, noise: mu)

    def total_fn(p):
        o, _ = mixvae.apply(p, bn, cfg, xs, jax.random.key(0), temp=1.0,
                            train=False)
        return mixvae_loss(cfg, o, xs).total

    jparams = jax.tree_util.tree_map(np.asarray, params)
    grads = jax.grad(total_fn)(jparams)

    assert float(ref_total) == pytest.approx(float(total_fn(jparams)),
                                             rel=2e-4)
    checked = 0
    for name, g in grads.items():
        for a in range(Ag):
            rg_w = ref_grads[f"{name}.{a}.weight"]
            np.testing.assert_allclose(
                np.asarray(g["w"][a]), rg_w.numpy().T, rtol=1e-3, atol=1e-4,
                err_msg=f"d total/d {name}.{a}.weight diverges from torch "
                        f"autograd")
            rg_b = ref_grads.get(f"{name}.{a}.bias")
            if rg_b is not None and g.get("b") is not None:
                np.testing.assert_allclose(
                    np.asarray(g["b"][a]), rg_b.numpy(), rtol=1e-3,
                    atol=1e-4,
                    err_msg=f"d total/d {name}.{a}.bias diverges")
            checked += 1
    assert checked >= 14 * Ag  # every layer of every arm was compared
