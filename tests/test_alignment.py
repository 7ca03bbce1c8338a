"""Cross-arm category alignment (train/alignment.py).

The alignment move must be (a) a correct Hungarian relabeling of each
arm to the reference arm, (b) exactly loss-neutral per arm — every
non-coupling output of the forward is invariant, only the category axis
is renamed — and (c) mirrored into the Adam moments so optimization
resumes unperturbed.  The trainer hook is exercised end-to-end with a
cadence that fires mid-run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu.config import VAEConfig
from dvae_tpu.models import mixvae
from dvae_tpu.train.alignment import (align_state, match_to_reference,
                                      permute_categories, permute_opt_state)

K, A, B, D, F, L, S = 7, 3, 32, 24, 16, 6, 2


def _cfg(**kw):
    kw.setdefault("n_categories", K)
    kw.setdefault("n_arm", A)
    kw.setdefault("input_dim", D)
    kw.setdefault("fc_dim", F)
    kw.setdefault("lowD_dim", L)
    kw.setdefault("state_dim", S)
    kw.setdefault("fused_recon", False)
    kw.setdefault("fused_encoder", False)
    return VAEConfig(**kw)


class TestMatchToReference:
    def test_recovers_planted_permutation(self):
        rng = np.random.default_rng(0)
        ref = rng.integers(0, K, size=400)
        perm = np.array([3, 0, 6, 1, 5, 2, 4])
        labels = np.stack([ref, perm[ref]])
        m = match_to_reference(labels, K)
        # arm 1 uses index perm[c] where arm 0 uses c: the relabeling must
        # send perm[c] back to c
        assert np.array_equal(m[0], np.arange(K))
        assert np.array_equal(m[1][perm[ref]], ref)

    def test_identity_when_aligned(self):
        rng = np.random.default_rng(1)
        ref = rng.integers(0, K, size=200)
        m = match_to_reference(np.stack([ref, ref, ref]), K)
        assert np.array_equal(m, np.tile(np.arange(K), (3, 1)))

    def test_noisy_majority_match(self):
        # 85% of cells follow the planted permutation, 15% random noise:
        # Hungarian still recovers it exactly
        rng = np.random.default_rng(2)
        ref = rng.integers(0, K, size=2000)
        perm = np.array([5, 3, 0, 6, 2, 4, 1])
        noisy = perm[ref].copy()
        flip = rng.random(2000) < 0.15
        noisy[flip] = rng.integers(0, K, size=int(flip.sum()))
        m = match_to_reference(np.stack([ref, noisy]), K)
        assert np.array_equal(m[1], np.argsort(perm))  # m[perm[c]] == c

    def test_active_mask_fixes_pruned_indices(self):
        # categories 2 and 5 pruned: labels live on {0,1,3,4,6}; the match
        # must recover the planted permutation ON the active set and map
        # every pruned index to itself (active->active bijection)
        rng = np.random.default_rng(5)
        act = np.array([0, 1, 3, 4, 6])
        active = np.zeros(K, bool)
        active[act] = True
        ref = act[rng.integers(0, len(act), size=1500)]
        # planted permutation OF THE ACTIVE SET: 0->4, 1->6, 3->0, 4->3, 6->1
        perm = np.arange(K)
        perm[act] = act[[2, 4, 1, 0, 3]]
        m = match_to_reference(np.stack([ref, perm[ref]]), K, active=active)
        assert np.array_equal(m[0], np.arange(K))
        assert np.array_equal(m[1][perm[ref]], ref)     # relabels back
        assert np.array_equal(m[1][~active], np.flatnonzero(~active))
        assert set(m[1][active]) == set(act)            # active bijection

    def test_empty_active_row_cannot_unprune(self):
        # an active category with NO cells in either arm is a Hungarian
        # near-tie; without the restriction it could be matched to a pruned
        # column.  With it, every arm's permutation must fix the pruned set.
        rng = np.random.default_rng(6)
        active = np.array([1, 1, 1, 1, 0, 0, 0], bool)  # 4 active, cat 3 empty
        ref = rng.integers(0, 3, size=300)
        other = (ref + 1) % 3
        m = match_to_reference(np.stack([ref, other]), K, active=active)
        assert np.array_equal(m[1][4:], np.arange(4, K))
        assert set(m[1][:4]) == {0, 1, 2, 3}


class TestPermutationInvariance:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = _cfg()
        key = jax.random.key(7)
        params = mixvae.init_params(jax.random.fold_in(key, 0), cfg)
        bn = mixvae.init_bn_state(cfg)
        xs = jax.random.normal(jax.random.fold_in(key, 1), (A, B, D))
        return cfg, params, bn, xs

    def _m(self):
        rng = np.random.default_rng(3)
        m = np.stack([np.arange(K)] + [rng.permutation(K)
                                       for _ in range(A - 1)])
        return m

    def test_eval_forward_invariant_up_to_relabeling(self, setup):
        cfg, params, bn, xs = setup
        m = self._m()
        inv = np.argsort(m, axis=1)
        key = jax.random.key(9)
        out0, _ = mixvae.apply(params, bn, cfg, xs, key, train=False)
        out1, _ = mixvae.apply(permute_categories(params, m, cfg), bn, cfg,
                               xs, key, train=False)
        # categorical posterior: renamed only — new col j holds old col inv[j]
        for a in range(A):
            np.testing.assert_allclose(np.asarray(out1.c[a]),
                                       np.asarray(out0.c[a])[:, inv[a]],
                                       rtol=1e-5, atol=1e-6)
        # labels follow m
        lab0 = np.asarray(jnp.argmax(out0.c, axis=-1))
        lab1 = np.asarray(jnp.argmax(out1.c, axis=-1))
        assert np.array_equal(lab1, np.take_along_axis(m, lab0, axis=1))
        # everything downstream of the (relabeled) one-hot is invariant
        np.testing.assert_allclose(np.asarray(out1.x_rec),
                                   np.asarray(out0.x_rec),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out1.s_mean),
                                   np.asarray(out0.s_mean),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out1.s_logvar),
                                   np.asarray(out0.s_logvar),
                                   rtol=1e-5, atol=1e-6)

    def test_train_forward_invariant_same_key(self, setup):
        # train mode draws dropout/gumbel/reparam noise from the SAME key:
        # the gumbel draw is per-category, so use the per-arm loss pieces
        # that don't depend on the category labeling: x_low (encoder trunk)
        cfg, params, bn, xs = setup
        m = self._m()
        key = jax.random.key(11)
        out0, _ = mixvae.apply(params, bn, cfg, xs, key, train=True)
        out1, _ = mixvae.apply(permute_categories(params, m, cfg), bn, cfg,
                               xs, key, train=True)
        np.testing.assert_allclose(np.asarray(out1.x_low),
                                   np.asarray(out0.x_low),
                                   rtol=1e-5, atol=1e-6)
        inv = np.argsort(m, axis=1)
        for a in range(A):
            np.testing.assert_allclose(np.asarray(out1.c_prob[a]),
                                       np.asarray(out0.c_prob[a])[:, inv[a]],
                                       rtol=1e-5, atol=1e-6)

    def test_zinb_head_params_covered(self):
        # ZINB mode adds fc11_p/fc11_r (no category axis): permutation must
        # pass them through and keep the forward invariant
        cfg = _cfg(mode="ZINB")
        key = jax.random.key(13)
        params = mixvae.init_params(key, cfg)
        bn = mixvae.init_bn_state(cfg)
        xs = jax.random.normal(jax.random.fold_in(key, 1), (A, B, D))
        m = self._m()
        out0, _ = mixvae.apply(params, bn, cfg, xs, key, train=False)
        out1, _ = mixvae.apply(permute_categories(params, m, cfg), bn, cfg,
                               xs, key, train=False)
        np.testing.assert_allclose(np.asarray(out1.x_rec),
                                   np.asarray(out0.x_rec),
                                   rtol=1e-5, atol=1e-5)


class TestOptStatePermutation:
    def test_adam_moments_follow_params(self):
        import optax

        cfg = _cfg()
        params = mixvae.init_params(jax.random.key(5), cfg)
        tx = optax.adam(1e-3)
        state = tx.init(params)
        # make the moments distinguishable: mu := params
        adam = state[0]._replace(
            mu=jax.tree_util.tree_map(lambda p: p + 0.0, params))
        state = (adam,) + state[1:]
        m = np.stack([np.arange(K), np.roll(np.arange(K), 2),
                      np.random.default_rng(6).permutation(K)])
        new = permute_opt_state(state, m, cfg)
        want = permute_categories(params, m, cfg)
        for name in ("fcc", "fc_mu", "fc_sigma", "fc6"):
            np.testing.assert_array_equal(np.asarray(new[0].mu[name]["w"]),
                                          np.asarray(want[name]["w"]))
        # count scalar untouched
        assert int(new[0].count) == int(state[0].count)
        # nu untouched in VALUE for non-category tensors
        np.testing.assert_array_equal(np.asarray(new[0].nu["fc1"]["w"]),
                                      np.asarray(state[0].nu["fc1"]["w"]))


class TestAlignState:
    def test_identity_short_circuits(self):
        import optax

        cfg = _cfg()
        from dvae_tpu.train.step import init_train_state
        st = init_train_state(jax.random.key(1), cfg, optax.adam(1e-3))
        ref = np.random.default_rng(0).integers(0, K, size=(1, 300))
        labels = np.repeat(ref, A, axis=0)
        new, m, moved = align_state(st, labels, cfg)
        assert moved == 0 and new is st

    def test_align_raises_label_consensus(self):
        import optax

        from dvae_tpu.eval.metrics import consensus_from_labels
        from dvae_tpu.train.step import init_train_state

        cfg = _cfg()
        st = init_train_state(jax.random.key(2), cfg, optax.adam(1e-3))
        rng = np.random.default_rng(8)
        ref = rng.integers(0, K, size=600)
        labels = np.stack([ref] + [rng.permutation(K)[ref]
                                   for _ in range(A - 1)])
        new, m, moved = align_state(st, labels, cfg)
        assert moved > 0
        relabeled = np.take_along_axis(m, labels, axis=1)
        assert consensus_from_labels(relabeled, K) == pytest.approx(1.0)
        assert consensus_from_labels(relabeled, K) > \
            consensus_from_labels(labels, K)

    def test_pruned_mask_restricts_and_forward_invariant(self):
        # align under a pruned mask: pruned indices are fixed points of m,
        # the mask needs no update, and the MASKED forward is invariant up
        # to renaming of the active categories
        import optax

        from dvae_tpu.train.step import init_train_state

        cfg = _cfg()
        st = init_train_state(jax.random.key(4), cfg, optax.adam(1e-3))
        mask = np.ones(K, np.float32)
        mask[[2, 5]] = 0.0
        act = np.flatnonzero(mask)
        rng = np.random.default_rng(9)
        ref = act[rng.integers(0, len(act), size=500)]
        perm = np.arange(K)
        perm[act] = act[rng.permutation(len(act))]
        labels = np.stack([ref] + [perm[ref]] * (A - 1))
        new, m, moved = align_state(st, labels, cfg, mask=mask)
        assert np.array_equal(m[:, mask == 0],
                              np.tile([2, 5], (A, 1)))   # pruned fixed
        for a in range(A):
            assert set(m[a][act]) == set(act)            # active bijection
        if moved:
            xs = jax.random.normal(jax.random.key(8), (A, B, D))
            kmask = jnp.asarray(mask)
            out0, _ = mixvae.apply(st.params, st.bn, cfg, xs,
                                   jax.random.key(3), train=False, mask=kmask)
            out1, _ = mixvae.apply(new.params, new.bn, cfg, xs,
                                   jax.random.key(3), train=False, mask=kmask)
            inv = np.argsort(m, axis=1)
            for a in range(A):
                np.testing.assert_allclose(np.asarray(out1.c[a]),
                                           np.asarray(out0.c[a])[:, inv[a]],
                                           rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(out1.x_rec),
                                       np.asarray(out0.x_rec),
                                       rtol=1e-5, atol=1e-5)
            # pruned columns stay exactly zero after the permutation
            assert np.all(np.asarray(out1.c)[:, :, mask == 0] == 0.0)


class TestTrainerHook:
    def test_end_to_end_alignment_fires(self, tmp_path):
        from dvae_tpu.data.anndata_io import synthetic_dataset
        from dvae_tpu.train.cpl_mixvae import CplMixVAE

        ds = synthetic_dataset(256, 48, 5)
        cpl = CplMixVAE(saving_folder=str(tmp_path))
        cpl.init_model(n_categories=5, input_dim=48, fc_dim=24, lowD_dim=6,
                       n_arm=3, batch_size=64, epochs_per_jit=4,
                       align_arms_every=4, ckpt_every=1000, eval_every=1000)
        cpl.train(ds.log1p, n_epoch=8, save_plots=False)
        assert int(cpl.state.epoch) == 8
        # the loss stays finite through the permutation (Adam moments moved
        # with their categories)
        lab = cpl._predict_labels(ds.log1p, temp=1.0, batch_size=64)
        assert lab.shape == (3, 256)

    def test_pruned_mask_aligns_within_active_set(self, tmp_path):
        # alignment DOES fire under a pruned mask (restricted to the active
        # set): the shared mask must come through exactly untouched —
        # pruned indices are fixed points of every arm's permutation — and
        # training completes with labels confined to active categories
        from dvae_tpu.data.anndata_io import synthetic_dataset
        from dvae_tpu.train.cpl_mixvae import CplMixVAE

        ds = synthetic_dataset(128, 32, 4)
        cpl = CplMixVAE(saving_folder=str(tmp_path))
        cpl.init_model(n_categories=6, input_dim=32, fc_dim=16, lowD_dim=4,
                       n_arm=2, batch_size=64, epochs_per_jit=2, n_pr=2,
                       align_arms_every=2, ckpt_every=1000, eval_every=1000)
        mask_before = np.asarray(cpl.state.mask).copy()
        assert mask_before.sum() == 4  # n_pr=2 of 6 pruned from the start
        cpl.train(ds.log1p, n_epoch=4, save_plots=False)
        np.testing.assert_array_equal(np.asarray(cpl.state.mask), mask_before)
        assert int(cpl.state.epoch) == 4
        lab = cpl._predict_labels(ds.log1p, temp=1.0, batch_size=64)
        assert np.isin(lab, np.flatnonzero(mask_before)).all()


class TestShardedAlignment:
    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual devices")
    def test_full_shard_alignment_preserves_shardings(self):
        import optax

        from dvae_tpu.config import MeshConfig, ShardingStrategy
        from dvae_tpu.parallel.sharding import make_mesh, strategy_shardings
        from dvae_tpu.train.step import init_train_state

        cfg = _cfg(n_categories=8, n_arm=2, input_dim=64, fc_dim=16,
                   lowD_dim=8)
        mesh = make_mesh(MeshConfig(data=2, arm=2, fsdp=2))
        tx = optax.adam(1e-3)
        st = init_train_state(jax.random.key(3), cfg, tx)
        shs = strategy_shardings(ShardingStrategy.FULL_SHARD, mesh,
                                 st.params, st.bn, st.opt_state)
        st = st._replace(params=jax.device_put(st.params, shs[0]),
                         opt_state=jax.device_put(st.opt_state, shs[2]))
        rng = np.random.default_rng(4)
        ref = rng.integers(0, 8, size=500)
        labels = np.stack([ref, rng.permutation(8)[ref]])
        new, m, moved = align_state(st, labels, cfg)
        assert moved > 0
        # every permuted leaf keeps the sharding layout it had (the _like
        # re-pin): the next donated runner call must not re-layout state
        for name in ("fcc", "fc_mu", "fc_sigma", "fc6"):
            assert new.params[name]["w"].sharding == \
                st.params[name]["w"].sharding, name
        # values actually moved: arm 1's fcc bias is permuted, arm 0's not
        inv1 = np.argsort(m[1])
        np.testing.assert_array_equal(
            np.asarray(new.params["fcc"]["b"][1]),
            np.asarray(st.params["fcc"]["b"][1])[inv1])
        np.testing.assert_array_equal(
            np.asarray(new.params["fcc"]["b"][0]),
            np.asarray(st.params["fcc"]["b"][0]))


    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual devices")
    def test_host_offloaded_opt_state_aligns(self):
        # CPU-offload places Adam moments in pinned_host memory; the gather
        # must stage through device memory and re-pin (memory_kind survives)
        import optax

        from dvae_tpu.config import MeshConfig, ShardingStrategy
        from dvae_tpu.parallel.sharding import make_mesh, opt_state_shardings
        from dvae_tpu.train.step import init_train_state

        cfg = _cfg(n_categories=8, n_arm=2, input_dim=64, fc_dim=16,
                   lowD_dim=8)
        mesh = make_mesh(MeshConfig(data=2, arm=2, fsdp=2))
        st = init_train_state(jax.random.key(3), cfg, optax.adam(1e-3))
        oshs = opt_state_shardings(st.opt_state, mesh,
                                   ShardingStrategy.FULL_SHARD,
                                   offload_host=True)
        st = st._replace(opt_state=jax.device_put(st.opt_state, oshs))
        rng = np.random.default_rng(4)
        ref = rng.integers(0, 8, size=400)
        labels = np.stack([ref, rng.permutation(8)[ref]])
        new, m, moved = align_state(st, labels, cfg)
        assert moved > 0
        got = new.opt_state[0].mu["fcc"]["w"].sharding
        assert got == st.opt_state[0].mu["fcc"]["w"].sharding
        assert got.memory_kind == "pinned_host"



class TestMovedCounts:
    def test_active_excludes_unused_categories(self):
        from dvae_tpu.train.alignment import moved_counts

        # arms use only categories {0,1,2} of K=7; m swaps 1<->2 (active in
        # both arms) and shuffles the unused 4,5,6
        labels = np.array([[0, 1, 2, 1, 0], [0, 2, 1, 2, 0]])
        m = np.stack([np.arange(7), np.array([0, 2, 1, 3, 5, 6, 4])])
        total, active = moved_counts(m, labels)
        assert total == 5       # indices 1,2,4,5,6 moved in arm 1
        assert active == 2      # only 1 and 2 carry cells in arm 1
